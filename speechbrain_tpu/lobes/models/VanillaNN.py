"""Simple feedforward encoder.

Capability parity with the reference's
``speechbrain/lobes/models/VanillaNN.py``: a stack of Linear + activation
blocks used in templates and simple recipes.
"""

import flax.linen as nn

from speechbrain_tpu.nnet.linear import Linear


class VanillaNN(nn.Module):
    """(batch, time, feat) -> (batch, time, dnn_neurons).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = VanillaNN(dnn_blocks=2, dnn_neurons=32)
    >>> x = jnp.ones((2, 10, 40))
    >>> p = model.init(jax.random.PRNGKey(0), x)
    >>> model.apply(p, x).shape
    (2, 10, 32)
    """

    activation: str = "leaky_relu"
    dnn_blocks: int = 2
    dnn_neurons: int = 512

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        for b in range(self.dnn_blocks):
            x = Linear(self.dnn_neurons, name=f"linear_{b}")(x)
            x = act(x)
        return x
