"""Dropout variants.

Capability parity with the reference's ``speechbrain/nnet/dropout.py``
(Dropout2d :15): drops whole channels of (batch, time, channel) data.
Uses the "dropout" rng collection (flax convention).
"""

import flax.linen as nn


class Dropout2d(nn.Module):
    """Channel dropout: zeroes entire channels.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> drop = Dropout2d(drop_rate=0.5)
    >>> x = jnp.ones((4, 10, 8))
    >>> out = drop.apply({}, x, train=False)
    >>> bool((out == x).all())
    True
    """

    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        if not train or self.drop_rate == 0.0:
            return x
        # broadcast the mask over time: whole-channel drop
        return nn.Dropout(
            rate=self.drop_rate,
            broadcast_dims=(1,),
            deterministic=False,
        )(x)
