"""VGG-style encoder (ESPnet flavor).

Capability parity with the reference's
``speechbrain/lobes/models/ESPnetVGG.py``: 2 VGG conv blocks with 2x time
pooling each, then RNN layers.
"""

import flax.linen as nn
import jax

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.pooling import Pooling2d
from speechbrain_tpu.nnet.RNN import LSTM


class ESPnetVGG(nn.Module):
    """(B, T, F) -> (B, T/4, rnn_neurons[*2 if bi]).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ESPnetVGG(channels=(4, 8), rnn_neurons=16)
    >>> x = jnp.ones((2, 32, 20))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (2, 8, 32)
    """

    channels: tuple = (64, 128)
    rnn_layers: int = 4
    rnn_neurons: int = 512
    rnn_bidirectional: bool = True
    dropout: float = 0.15

    @nn.compact
    def __call__(self, x, train=False):
        y = x[..., None]
        for b, ch in enumerate(self.channels):
            y = jax.nn.relu(Conv2d(ch, (3, 3), name=f"conv_{b}_0")(y))
            y = jax.nn.relu(Conv2d(ch, (3, 3), name=f"conv_{b}_1")(y))
            y = Pooling2d("max", (2, 2), name=f"pool_{b}")(y)
        B, T, F, C = y.shape
        y = y.reshape(B, T, F * C)
        y, _ = LSTM(
            hidden_size=self.rnn_neurons,
            num_layers=self.rnn_layers,
            bidirectional=self.rnn_bidirectional,
            dropout=self.dropout,
            name="rnn",
        )(y, train=train)
        return y
