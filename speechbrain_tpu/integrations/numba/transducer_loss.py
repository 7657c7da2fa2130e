"""Transducer (RNN-T) loss — TPU-native home.

The reference's ``speechbrain/integrations/numba/transducer_loss.py``
holds Numba CUDA kernels (cu_kernel_forward at transducer_loss.py:40) —
the only GPU kernel in that repo. On TPU the loss is implemented as an
XLA program (``lax.scan`` over T with a log-semiring associative scan
over U) in :mod:`speechbrain_tpu.nnet.transducer_loss`; this module
re-exports it so recipe imports keep working.
"""

from speechbrain_tpu.nnet.transducer_loss import (  # noqa: F401
    TransducerLoss,
    transducer_loss,
)
