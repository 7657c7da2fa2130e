"""ResNet speaker embedding model.

Capability parity with the reference's
``speechbrain/lobes/models/ResNet.py`` (spkrec-resnet-voxceleb, EER
0.95%): pre-activation 3-conv blocks (BN->ReLU->conv3x3, BN->ReLU->
conv3x3, BN->ReLU->conv1x1) with channel squeeze-excitation on the
first two stages only, stage strides (1, 2, 2, 2), frequency-flattened
attentive statistics pooling, and BN-normalized embedding — the exact
reference topology so published checkpoints pour 1:1
(utils/torch_convert.resnet_key_map).

TPU notes: NHWC layout; the stride-2 convs use explicit torch-style
(1, 1) zero padding so poured checkpoints reproduce the reference's
downsampled shapes bit-for-bit.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d


def _conv3x3(out_channels, stride, name):
    return Conv2d(out_channels, (3, 3), stride=(stride, stride),
                  bias=False, padding="valid", name=name)


class SEBlock2d(nn.Module):
    """Channel squeeze-excitation for NHWC maps (reference
    ResNet.py:38; the reference uses reduction=1 in its blocks)."""

    reduction: int = 1

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        s = jax.nn.relu(Linear(max(C // self.reduction, 1), name="fc1")(s))
        s = jax.nn.sigmoid(Linear(C, name="fc2")(s))
        return x * s[:, None, None, :]


class PreActBlock(nn.Module):
    """Pre-activation 3-conv residual block, optional SE (reference
    SEBasicBlock :154 / BasicBlock :81 share this topology; only the
    presence of the SE module differs)."""

    out_channels: int
    stride: int = 1
    use_se: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        def pad1(z):
            # torch conv3x3(padding=1): explicit zero pad, both sides
            return jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))

        y = BatchNorm1d(name="bn1")(x, train=train)
        y = jax.nn.relu(y)
        y = _conv3x3(self.out_channels, self.stride, "conv1")(pad1(y))
        y = BatchNorm1d(name="bn2")(y, train=train)
        y = jax.nn.relu(y)
        y = _conv3x3(self.out_channels, 1, "conv2")(pad1(y))
        y = BatchNorm1d(name="bn3")(y, train=train)
        y = jax.nn.relu(y)
        y = Conv2d(self.out_channels, (1, 1), bias=False,
                   padding="valid", name="conv3")(y)
        if self.use_se:
            y = SEBlock2d(name="se")(y)
        residual = x
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            residual = Conv2d(
                self.out_channels, (1, 1),
                stride=(self.stride, self.stride), bias=False,
                padding="valid", name="down",
            )(x)
            residual = BatchNorm1d(name="bn_down")(residual, train=train)
        # the reference adds the residual with NO final activation
        return y + residual


class ResNet(nn.Module):
    """ResNet speaker encoder: (B, T, F) feats -> (B, 1, emb)
    (reference ResNet.py:235).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ResNet(channels=(8, 8, 16, 16), layers=(1, 1, 1, 1),
    ...              lin_neurons=16)
    >>> x = jnp.ones((2, 40, 24))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 1, 16)
    """

    layers: tuple = (3, 4, 6, 3)
    # reference defaults (ResNet.py:269): the published
    # spkrec-resnet-voxceleb checkpoint pours into a default-built module
    channels: tuple = (128, 128, 256, 256)
    lin_neurons: int = 256
    attention_channels: int = 128
    strides: tuple = (1, 2, 2, 2)

    @nn.compact
    def __call__(self, x, lengths=None, train=False):
        y = x[..., None]  # (B, T, F, 1)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = Conv2d(self.channels[0], (3, 3), bias=False,
                   padding="valid", name="conv_in")(y)
        y = BatchNorm1d(name="bn_in")(y, train=train)
        y = jax.nn.relu(y)
        for stage, (n_blocks, planes, stride) in enumerate(
            zip(self.layers, self.channels, self.strides)
        ):
            for b in range(n_blocks):
                y = PreActBlock(
                    out_channels=planes,
                    stride=stride if b == 0 else 1,
                    use_se=stage < 2,  # SE on the first two stages only
                    name=f"block_{stage}_{b}",
                )(y, train=train)
        # (B, T', F', C) -> (B, T', F'*C): flatten freq into channels
        # (the reference transposes to (B, C, F', T') and flattens (1,2))
        B, T, F, C = y.shape
        feat = y.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        # attentive statistics over time (softmax attention, ref :305)
        w = Linear(self.attention_channels, name="attn_in")(feat)
        w = jax.nn.relu(w)
        w = BatchNorm1d(name="attn_bn")(w, train=train)
        w = Linear(C * F, name="attn_out")(w)
        w = jax.nn.softmax(w, axis=1)
        mu = jnp.sum(feat * w, axis=1)
        sg = jnp.sqrt(
            jnp.clip(jnp.sum(feat**2 * w, axis=1) - mu**2, min=1e-5)
        )
        stats = jnp.concatenate([mu, sg], axis=-1)
        stats = BatchNorm1d(name="norm_stats")(stats, train=train)
        emb = Linear(self.lin_neurons, name="fc_embed")(stats)
        emb = BatchNorm1d(name="norm_embed")(emb, train=train)
        return emb[:, None, :]
