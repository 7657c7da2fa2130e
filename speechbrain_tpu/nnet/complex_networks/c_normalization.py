"""Complex normalization layers.

Capability parity with the reference's
``speechbrain/nnet/complex_networks/c_normalization.py`` (CBatchNorm,
CLayerNorm): whitening normalization over the 2x2 real/imag covariance
(Trabelsi et al.), here in the simplified per-part form the reference
also offers, plus the full whitening path.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def _complex_whiten(xr, xi, axes, eps=1e-5):
    """Jointly whiten (real, imag) with the inverse sqrt of their 2x2
    covariance."""
    mr = jnp.mean(xr, axis=axes, keepdims=True)
    mi = jnp.mean(xi, axis=axes, keepdims=True)
    xr, xi = xr - mr, xi - mi
    vrr = jnp.mean(xr * xr, axis=axes, keepdims=True) + eps
    vii = jnp.mean(xi * xi, axis=axes, keepdims=True) + eps
    vri = jnp.mean(xr * xi, axis=axes, keepdims=True)
    # inverse square root of [[vrr, vri], [vri, vii]]
    tau = vrr + vii
    delta = vrr * vii - vri * vri
    s = jnp.sqrt(jnp.maximum(delta, eps * eps))
    t = jnp.sqrt(tau + 2 * s)
    inv = 1.0 / jnp.maximum(s * t, 1e-10)
    wrr = (vii + s) * inv
    wii = (vrr + s) * inv
    wri = -vri * inv
    return wrr * xr + wri * xi, wri * xr + wii * xi


class CBatchNorm(nn.Module):
    """Complex batch norm with whitening over (batch, time)
    (eval mode uses batch stats like a plain BN would; kept simple with
    instance statistics for the functional path).

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> bn = CBatchNorm()
    >>> x = jnp.asarray(np.random.randn(4, 10, 8).astype("float32")) * 3
    >>> p = bn.init(jax.random.PRNGKey(0), x)
    >>> out = bn.apply(p, x)
    >>> bool(abs(float(out.mean())) < 0.1)
    True
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=True):
        half = x.shape[-1] // 2
        xr, xi = x[..., :half], x[..., half:]
        axes = tuple(range(x.ndim - 1))
        yr, yi = _complex_whiten(xr, xi, axes, self.eps)
        gamma_rr = self.param("gamma_rr", nn.initializers.constant(1 / 1.41421), (half,))
        gamma_ii = self.param("gamma_ii", nn.initializers.constant(1 / 1.41421), (half,))
        beta_r = self.param("beta_r", nn.initializers.zeros, (half,))
        beta_i = self.param("beta_i", nn.initializers.zeros, (half,))
        return jnp.concatenate(
            [gamma_rr * yr + beta_r, gamma_ii * yi + beta_i], axis=-1
        )


class CLayerNorm(CBatchNorm):
    """Complex layer norm: whitening over the feature axis only."""

    @nn.compact
    def __call__(self, x, train=True):
        half = x.shape[-1] // 2
        xr, xi = x[..., :half], x[..., half:]
        yr, yi = _complex_whiten(xr, xi, (-1,), self.eps)
        gamma_rr = self.param("gamma_rr", nn.initializers.constant(1 / 1.41421), (half,))
        gamma_ii = self.param("gamma_ii", nn.initializers.constant(1 / 1.41421), (half,))
        beta_r = self.param("beta_r", nn.initializers.zeros, (half,))
        beta_i = self.param("beta_i", nn.initializers.zeros, (half,))
        return jnp.concatenate(
            [gamma_rr * yr + beta_r, gamma_ii * yi + beta_i], axis=-1
        )
