"""ResNet speaker embedding model.

Capability parity with the reference's ``speechbrain/lobes/models/ResNet.py``
(ResNet with SEBasicBlocks + attentive statistics pooling): 2D resnet over
(time, freq) with channel squeeze-excitation, used for
spkrec-resnet-voxceleb.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d


class SEBlock2d(nn.Module):
    """Channel squeeze-excitation for NHWC maps."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        s = jax.nn.relu(Linear(max(C // self.reduction, 4), name="fc1")(s))
        s = jax.nn.sigmoid(Linear(C, name="fc2")(s))
        return x * s[:, None, None, :]


class SEBasicBlock(nn.Module):
    """Conv-BN-ReLU x2 + SE + residual (reference ResNet.py SEBasicBlock)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = Conv2d(self.planes, (3, 3), stride=(self.stride, self.stride),
                   bias=False, name="conv1")(x)
        y = BatchNorm1d(name="bn1")(y, train=train)
        y = jax.nn.relu(y)
        y = Conv2d(self.planes, (3, 3), bias=False, name="conv2")(y)
        y = BatchNorm1d(name="bn2")(y, train=train)
        y = SEBlock2d(name="se")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = Conv2d(self.planes, (1, 1),
                              stride=(self.stride, self.stride),
                              bias=False, name="down")(x)
            residual = BatchNorm1d(name="bn_down")(residual, train=train)
        return jax.nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet speaker encoder: (B, T, F) feats -> (B, 1, emb)
    (reference ResNet.py).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ResNet(channels=(8, 8, 16, 16), layers=(1, 1, 1, 1), lin_neurons=16)
    >>> x = jnp.ones((2, 40, 24))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 1, 16)
    """

    layers: tuple = (3, 4, 6, 3)
    channels: tuple = (32, 64, 128, 256)
    lin_neurons: int = 256

    @nn.compact
    def __call__(self, x, lengths=None, train=False):
        from speechbrain_tpu.lobes.models.ECAPA_TDNN import (
            AttentiveStatisticsPooling,
        )

        y = x[..., None]  # (B, T, F, 1)
        y = Conv2d(self.channels[0], (3, 3), bias=False, name="conv_in")(y)
        y = BatchNorm1d(name="bn_in")(y, train=train)
        y = jax.nn.relu(y)
        for stage, (n_blocks, planes) in enumerate(zip(self.layers, self.channels)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = SEBasicBlock(planes=planes, stride=stride,
                                 name=f"block_{stage}_{b}")(y, train=train)
        B, T, F, C = y.shape
        y = y.reshape(B, T, F * C)
        y = AttentiveStatisticsPooling(attention_channels=64, name="asp")(
            y, lengths=lengths, train=train
        )
        y = BatchNorm1d(name="asp_bn")(y, train=train)
        return Linear(self.lin_neurons, name="fc")(y)
