"""Quaternion convolutions.

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/q_CNN.py`` (QConv1d, QConv2d):
Hamilton-product convs built from four real convs.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, Conv2d


def _hamilton_combine(parts, convs):
    xr, xi, xj, xk = parts
    cr, ci, cj, ck = convs
    real = cr(xr) - ci(xi) - cj(xj) - ck(xk)
    imag_i = cr(xi) + ci(xr) + cj(xk) - ck(xj)
    imag_j = cr(xj) - ci(xk) + cj(xr) + ck(xi)
    imag_k = cr(xk) + ci(xj) - cj(xi) + ck(xr)
    return jnp.concatenate([real, imag_i, imag_j, imag_k], axis=-1)


class QConv1d(nn.Module):
    """Quaternion 1-D conv on (batch, time, 4*channels).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = QConv1d(out_channels=4, kernel_size=3)
    >>> x = jnp.ones((2, 10, 8))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 10, 16)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        q = x.shape[-1] // 4
        parts = [x[..., n * q : (n + 1) * q] for n in range(4)]
        convs = [
            Conv1d(self.out_channels, self.kernel_size, stride=self.stride,
                   dilation=self.dilation, padding=self.padding,
                   bias=self.bias and n == 0, name=f"conv_{c}")
            for n, c in enumerate("rijk")
        ]
        return _hamilton_combine(parts, convs)


class QConv2d(nn.Module):
    """Quaternion 2-D conv on (batch, time, feat, 4*channels)."""

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        q = x.shape[-1] // 4
        parts = [x[..., n * q : (n + 1) * q] for n in range(4)]
        convs = [
            Conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=self.padding, bias=self.bias and n == 0,
                   name=f"conv_{c}")
            for n, c in enumerate("rijk")
        ]
        return _hamilton_combine(parts, convs)
