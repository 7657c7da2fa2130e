"""Linear transformation layers.

Capability parity with the reference's ``speechbrain/nnet/linear.py``
(Linear :16, LinearWithConstraint). flax.linen with lazy shape
inference; weights stored (in_features, out_features) so the forward is
a single MXU matmul.
"""

import flax.linen as nn
import jax.numpy as jnp


class Linear(nn.Module):
    """y = x W + b over the last axis; optionally flattens a trailing
    channel axis first (``combine_dims``, matching the reference).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = Linear(n_neurons=100)
    >>> x = jnp.ones((8, 50, 40))
    >>> params = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(params, x).shape
    (8, 50, 100)
    """

    n_neurons: int
    bias: bool = True
    combine_dims: bool = False
    max_norm: float = None
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and self.combine_dims:
            x = x.reshape(x.shape[0], x.shape[1], x.shape[2] * x.shape[3])
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.n_neurons),
            jnp.float32,
        )
        if self.max_norm is not None:
            norm = jnp.linalg.norm(kernel, axis=0, keepdims=True)
            kernel = kernel * jnp.minimum(1.0, self.max_norm / (norm + 1e-12))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.matmul(x, kernel)
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.n_neurons,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y
