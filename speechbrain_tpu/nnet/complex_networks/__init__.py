"""Complex-valued neural networks (CVNNs).

Capability parity with the reference's
``speechbrain/nnet/complex_networks/`` (c_ops, c_linear, c_CNN, c_RNN,
c_normalization): layers over C represented as concatenated
[real | imag] feature halves, so every complex op lowers to real MXU
matmuls.
"""

from speechbrain_tpu.nnet.complex_networks.c_ops import (  # noqa: F401
    complex_linear_op,
    get_real,
    get_imag,
)
from speechbrain_tpu.nnet.complex_networks.c_linear import CLinear  # noqa: F401
from speechbrain_tpu.nnet.complex_networks.c_CNN import CConv1d, CConv2d  # noqa: F401
from speechbrain_tpu.nnet.complex_networks.c_RNN import CLSTM, CRNN, CLiGRU  # noqa: F401
from speechbrain_tpu.nnet.complex_networks.c_normalization import (  # noqa: F401
    CBatchNorm,
    CLayerNorm,
)
