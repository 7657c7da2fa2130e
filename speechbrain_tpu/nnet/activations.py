"""Activation functions.

Capability parity with the reference's ``speechbrain/nnet/activations.py``
(Softmax :16, GumbelSoftmax :80, Swish :133). Plain functions where
possible (XLA fuses them); modules only where RNG or params are involved.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class Softmax(nn.Module):
    """Softmax / log-softmax over a chosen axis, with optional length
    masking (padded positions get zero probability).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> sm = Softmax(apply_log=True)
    >>> out = sm.apply({}, jnp.ones((2, 3)))
    >>> out.shape
    (2, 3)
    """

    apply_log: bool = False
    axis: int = -1
    reshape: bool = True  # accepted for API parity

    @nn.compact
    def __call__(self, x, lengths=None):
        if lengths is not None:
            T = x.shape[1]
            mask = jnp.arange(T)[None, :] < jnp.round(lengths * T)[:, None]
            shape = mask.shape + (1,) * (x.ndim - 2)
            x = jnp.where(mask.reshape(shape), x, -jnp.inf)
        if self.apply_log:
            return jax.nn.log_softmax(x, axis=self.axis)
        return jax.nn.softmax(x, axis=self.axis)


class GumbelSoftmax(nn.Module):
    """Straight-through Gumbel-softmax sampling
    (reference nnet/activations.py:80). Needs an rng named "gumbel"."""

    tau: float = 1.0
    hard: bool = False
    apply_log: bool = False

    @nn.compact
    def __call__(self, x):
        rng = self.make_rng("gumbel")
        gumbels = -jnp.log(-jnp.log(jax.random.uniform(rng, x.shape) + 1e-20) + 1e-20)
        y = jax.nn.softmax((x + gumbels) / self.tau, axis=-1)
        if self.hard:
            # straight-through: hard one-hot forward, soft gradients backward
            y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), x.shape[-1], dtype=y.dtype)
            y = jax.lax.stop_gradient(y_hard - y) + y
        if self.apply_log:
            return jnp.log(y + 1e-20)
        return y


def swish(x, beta=1.0):
    """x * sigmoid(beta x) (SiLU when beta=1; reference :133).

    Example
    -------
    >>> float(swish(0.0))
    0.0
    """
    return x * jax.nn.sigmoid(beta * x)


class Swish(nn.Module):
    """Swish activation module (x * sigmoid(beta x))."""
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        return swish(x, self.beta)


# convenient aliases used across lobes
relu = jax.nn.relu
leaky_relu = jax.nn.leaky_relu
gelu = jax.nn.gelu
sigmoid = jax.nn.sigmoid
tanh = jnp.tanh
elu = jax.nn.elu


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "gelu": jax.nn.gelu,
    "swish": swish,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
}


def get_activation(name_or_fn):
    """Resolve an activation by name or pass through a callable."""
    if callable(name_or_fn):
        return name_or_fn
    return ACTIVATIONS[name_or_fn]
