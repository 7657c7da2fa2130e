"""Complex convolutions.

Capability parity with the reference's
``speechbrain/nnet/complex_networks/c_CNN.py`` (CConv1d, CConv2d):
complex conv = two real convs combined per the complex product.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, Conv2d
from speechbrain_tpu.nnet.complex_networks.c_ops import get_imag, get_real


class CConv1d(nn.Module):
    """Complex 1-D conv on (batch, time, 2*channels).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = CConv1d(out_channels=8, kernel_size=3)
    >>> x = jnp.ones((2, 16, 12))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 16, 16)
    """

    out_channels: int  # complex units
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        xr, xi = get_real(x), get_imag(x)
        conv_r = Conv1d(self.out_channels, self.kernel_size, stride=self.stride,
                        dilation=self.dilation, padding=self.padding,
                        bias=self.bias, name="conv_real")
        conv_i = Conv1d(self.out_channels, self.kernel_size, stride=self.stride,
                        dilation=self.dilation, padding=self.padding,
                        bias=False, name="conv_imag")
        real = conv_r(xr) - conv_i(xi)
        imag = conv_r(xi) + conv_i(xr)
        return jnp.concatenate([real, imag], axis=-1)


class CConv2d(nn.Module):
    """Complex 2-D conv on (batch, time, feat, 2*channels)."""

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        half = x.shape[-1] // 2
        xr, xi = x[..., :half], x[..., half:]
        conv_r = Conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                        dilation=self.dilation, padding=self.padding,
                        bias=self.bias, name="conv_real")
        conv_i = Conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                        dilation=self.dilation, padding=self.padding,
                        bias=False, name="conv_imag")
        real = conv_r(xr) - conv_i(xi)
        imag = conv_r(xi) + conv_i(xr)
        return jnp.concatenate([real, imag], axis=-1)
