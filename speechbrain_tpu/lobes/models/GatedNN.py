"""Gated feedforward network.

Capability parity with the reference's
``speechbrain/lobes/models/GatedNN.py``: stack of gated linear blocks with
skip connections used in small enhancement/regression recipes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import LayerNorm


class GatedBlock(nn.Module):
    """Linear block with multiplicative gating."""
    hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        h = Linear(self.hidden, name="lin")(x)
        g = jax.nn.sigmoid(Linear(self.hidden, name="gate")(x))
        y = h * g
        y = LayerNorm(name="norm")(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        return y


class GatedNN(nn.Module):
    """(B, T, F) -> (B, T, out) gated MLP.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = GatedNN(blocks=2, hidden=16, out_neurons=8)
    >>> x = jnp.ones((2, 5, 12))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(p, x).shape
    (2, 5, 8)
    """

    blocks: int = 3
    hidden: int = 512
    out_neurons: int = 257
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=False):
        h = x
        for b in range(self.blocks):
            y = GatedBlock(hidden=self.hidden, dropout=self.dropout,
                           name=f"block_{b}")(h, train=train)
            h = y if b == 0 else h + y
        return Linear(self.out_neurons, name="out")(h)
