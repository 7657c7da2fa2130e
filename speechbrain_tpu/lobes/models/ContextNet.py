"""ContextNet encoder.

Capability parity with the reference's
``speechbrain/lobes/models/ContextNet.py`` (ContextNet :304, ContextNetBlock,
SEmodule): depthwise-separable conv blocks with squeeze-excitation and
residuals, swish activation.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, DepthwiseSeparableConv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d


class SEmodule(nn.Module):
    """Squeeze-excitation over channels for (B, T, C)."""

    inner_dim: int = 128

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1)
        s = jax.nn.relu(Linear(self.inner_dim, name="fc1")(s))
        s = jax.nn.sigmoid(Linear(x.shape[-1], name="fc2")(s))
        return x * s[:, None, :]


class ContextNetBlock(nn.Module):
    """n conv layers + SE + residual (reference ContextNet.py)."""

    out_channels: int
    kernel_size: int = 5
    n_layers: int = 5
    stride: int = 1
    residual: bool = True
    se_inner: int = 128

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.activations import swish

        y = x
        for i in range(self.n_layers):
            stride = self.stride if i == self.n_layers - 1 else 1
            y = DepthwiseSeparableConv1d(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                stride=stride,
                name=f"conv_{i}",
            )(y)
            y = BatchNorm1d(name=f"bn_{i}")(y, train=train)
            if i < self.n_layers - 1:
                y = swish(y)
        y = SEmodule(inner_dim=self.se_inner, name="se")(y)
        if self.residual:
            res = Conv1d(self.out_channels, 1, stride=self.stride,
                         name="res_conv")(x)
            res = BatchNorm1d(name="res_bn")(res, train=train)
            y = y + res
        return swish(y)


class ContextNet(nn.Module):
    """Full ContextNet encoder (reference ContextNet.py:304).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ContextNet(blocks=3, channels=(16, 16, 16), strides=(1, 2, 1))
    >>> x = jnp.ones((2, 32, 24))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 16, 16)
    """

    blocks: int = 23
    channels: tuple = None
    strides: tuple = None
    kernel_size: int = 5
    n_layers_per_block: int = 5

    @nn.compact
    def __call__(self, x, train=False):
        channels = self.channels or tuple([256] * self.blocks)
        strides = self.strides or tuple(
            2 if i in (2, 6, 13) else 1 for i in range(self.blocks)
        )
        for i in range(self.blocks):
            x = ContextNetBlock(
                out_channels=channels[i],
                kernel_size=self.kernel_size,
                n_layers=self.n_layers_per_block if 0 < i < self.blocks - 1 else 1,
                stride=strides[i],
                residual=0 < i < self.blocks - 1,
                name=f"block_{i}",
            )(x, train=train)
        return x
