"""Quaternion normalization.

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/q_normalization.py`` (QBatchNorm):
normalize the quaternion norm jointly over the four components.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class QBatchNorm(nn.Module):
    """Quaternion batch norm: zero-mean per component, unit expected
    quaternion norm.

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> qbn = QBatchNorm()
    >>> x = jnp.asarray(np.random.randn(8, 10, 16).astype("float32")) * 5
    >>> p = qbn.init(jax.random.PRNGKey(0), x)
    >>> out = qbn.apply(p, x)
    >>> bool(abs(float(out.mean())) < 0.2)
    True
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=True):
        q = x.shape[-1] // 4
        comps = jnp.stack(
            [x[..., n * q : (n + 1) * q] for n in range(4)], axis=0
        )  # (4, ..., q)
        axes = tuple(range(1, comps.ndim - 1))
        mean = jnp.mean(comps, axis=axes, keepdims=True)
        centered = comps - mean
        var = jnp.mean(
            jnp.sum(centered**2, axis=0, keepdims=True), axis=axes, keepdims=True
        )
        normed = centered * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (q,))
        beta = self.param("beta", nn.initializers.zeros, (4 * q,))
        out = jnp.concatenate([normed[n] * gamma for n in range(4)], axis=-1)
        return out + beta
