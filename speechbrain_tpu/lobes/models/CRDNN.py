"""CRDNN encoder: CNN blocks + RNN + DNN.

Capability parity with the reference's ``speechbrain/lobes/models/CRDNN.py``
(CRDNN :16 with CNN_Block/DNN_Block): the classic seq2seq/CTC ASR encoder
(asr-crdnn-rnnlm-librispeech). Channels-last 2D convs with frequency
pooling, optional time pooling, (bi)LSTM/LiGRU, then DNN blocks.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm
from speechbrain_tpu.nnet.pooling import Pooling2d
from speechbrain_tpu.nnet.RNN import LSTM, GRU, LiGRU, SLiGRU


class CRDNN(nn.Module):
    """(batch, time, feat) -> (batch, time', dnn_neurons).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = CRDNN(cnn_channels=(8, 16), rnn_neurons=32, dnn_neurons=32)
    >>> x = jnp.ones((2, 40, 40))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> out = model.apply(v, x, train=False)
    >>> out.shape
    (2, 40, 32)
    """

    activation: str = "leaky_relu"
    dropout: float = 0.15
    cnn_blocks: int = 2
    cnn_channels: tuple = (128, 256)
    cnn_kernelsize: tuple = (3, 3)
    time_pooling: bool = False
    time_pooling_size: int = 2
    freq_pooling_size: int = 2
    rnn_class: str = "lstm"
    inter_layer_pooling_size: tuple = (2, 2)
    using_2d_pooling: bool = False
    rnn_layers: int = 4
    rnn_neurons: int = 512
    rnn_bidirectional: bool = True
    rnn_re_init: bool = True
    dnn_blocks: int = 2
    dnn_neurons: int = 512
    projection_dim: int = -1
    use_rnnp: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, train=False):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        squeeze_channel = x.ndim == 3
        if squeeze_channel:
            y = x[..., None]  # (B, T, F, 1)
        else:
            y = x
        for b in range(self.cnn_blocks):
            # the CNN-block LayerNorm normalizes over BOTH trailing axes
            # (feat, channel) with (F, C) affine params — the reference's
            # LayerNorm(input_shape) semantics (checkpoint-parity: the
            # published CRDNN state_dicts carry (F, C) norm weights)
            y = Conv2d(
                out_channels=self.cnn_channels[b],
                kernel_size=self.cnn_kernelsize,
                name=f"conv_{b}_0",
            )(y)
            y = nn.LayerNorm(
                reduction_axes=(-2, -1), feature_axes=(-2, -1),
                name=f"cnn_norm_{b}_0",
            )(y)
            y = act(y)
            y = Conv2d(
                out_channels=self.cnn_channels[b],
                kernel_size=self.cnn_kernelsize,
                name=f"conv_{b}_1",
            )(y)
            y = nn.LayerNorm(
                reduction_axes=(-2, -1), feature_axes=(-2, -1),
                name=f"cnn_norm_{b}_1",
            )(y)
            y = act(y)
            pool = self.inter_layer_pooling_size[b]
            if pool > 1:
                if self.using_2d_pooling:
                    y = Pooling2d("max", (pool, pool), name=f"pool_{b}")(y)
                else:
                    # pool the frequency axis only
                    y = Pooling2d("max", (1, pool), name=f"pool_{b}")(y)
            if train and self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=False, broadcast_dims=(3,))(y)
        if self.time_pooling:
            y = Pooling2d("max", (self.time_pooling_size, 1), name="time_pool")(y)
        # flatten (freq, channel) -> features
        B, T, F, C = y.shape
        y = y.reshape(B, T, F * C)
        if self.projection_dim > 0:
            y = Linear(self.projection_dim, name="proj")(y)
        rnn_cls = {"lstm": LSTM, "gru": GRU, "ligru": LiGRU,
           "sligru": SLiGRU}[self.rnn_class]
        y, _ = rnn_cls(
            hidden_size=self.rnn_neurons,
            num_layers=self.rnn_layers,
            bidirectional=self.rnn_bidirectional,
            dropout=self.dropout,
            name="rnn",
        )(y, train=train)
        for b in range(self.dnn_blocks):
            y = Linear(self.dnn_neurons, name=f"dnn_{b}")(y)
            y = BatchNorm1d(name=f"dnn_norm_{b}")(y, train=train)
            y = act(y)
            if train and self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=False)(y)
        return y
