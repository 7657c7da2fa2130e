"""Quaternion-valued neural networks (QNNs).

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/`` (q_ops, q_linear, q_CNN, q_RNN,
q_normalization): layers over H represented as concatenated
[r | i | j | k] feature quarters — the Hamilton product lowers to one
real matmul with the 4x4 block structure (MXU-friendly).
"""

from speechbrain_tpu.nnet.quaternion_networks.q_ops import (  # noqa: F401
    quaternion_linear_op,
)
from speechbrain_tpu.nnet.quaternion_networks.q_linear import QLinear  # noqa: F401
from speechbrain_tpu.nnet.quaternion_networks.q_CNN import QConv1d, QConv2d  # noqa: F401
from speechbrain_tpu.nnet.quaternion_networks.q_RNN import QLSTM, QRNN, QLiGRU  # noqa: F401
from speechbrain_tpu.nnet.quaternion_networks.q_normalization import QBatchNorm  # noqa: F401
from speechbrain_tpu.nnet.quaternion_networks.q_pooling import QPooling2d  # noqa: F401
