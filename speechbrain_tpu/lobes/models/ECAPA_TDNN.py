"""ECAPA-TDNN speaker embedding model.

Capability parity with the reference's
``speechbrain/lobes/models/ECAPA_TDNN.py`` (TDNNBlock :32, Res2NetBlock :88,
SEBlock :164, AttentiveStatisticsPooling :232, SERes2NetBlock :324,
ECAPA_TDNN :420, Classifier :562): Res2Net multi-scale TDNN with
squeeze-excitation, multi-layer feature aggregation and attentive
statistics pooling. Channels-last flax modules; all poolings masked by
relative lengths.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d


def _length_mask(x, lengths):
    """(B, T, 1) float mask from relative lengths."""
    T = x.shape[1]
    if lengths is None:
        return jnp.ones((x.shape[0], T, 1), x.dtype)
    return (
        jnp.arange(T)[None, :] < jnp.round(lengths * T)[:, None]
    ).astype(x.dtype)[..., None]


class TDNNBlock(nn.Module):
    """Conv1d -> activation -> BatchNorm (reference ECAPA_TDNN.py:32)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        x = Conv1d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            groups=self.groups,
            name="conv",
        )(x)
        x = jax.nn.relu(x)
        return BatchNorm1d(name="norm")(x, train=train)


class Res2NetBlock(nn.Module):
    """Multi-scale hierarchical convolutions over channel splits
    (reference ECAPA_TDNN.py:88)."""

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        in_channel = x.shape[-1]
        assert in_channel % self.scale == 0
        assert self.out_channels % self.scale == 0
        hidden = self.out_channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outputs = []
        y_prev = None
        for i, chunk in enumerate(chunks):
            if i == 0:
                y = chunk
            elif i == 1:
                y = TDNNBlock(
                    hidden, self.kernel_size, self.dilation, name=f"block_{i}"
                )(chunk, train=train)
            else:
                y = TDNNBlock(
                    hidden, self.kernel_size, self.dilation, name=f"block_{i}"
                )(chunk + y_prev, train=train)
            outputs.append(y)
            y_prev = y
        return jnp.concatenate(outputs, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-and-excitation over channels with masked time average
    (reference ECAPA_TDNN.py:164)."""

    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        mask = _length_mask(x, lengths)
        total = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        s = jnp.sum(x * mask, axis=1, keepdims=True) / total  # (B, 1, C)
        s = jax.nn.relu(Conv1d(self.se_channels, 1, name="conv1")(s))
        s = jax.nn.sigmoid(Conv1d(self.out_channels, 1, name="conv2")(s))
        return x * s


class AttentiveStatisticsPooling(nn.Module):
    """Attention-weighted mean+std over time with global context
    (reference ECAPA_TDNN.py:232). Returns (B, 1, 2C)."""

    attention_channels: int = 128
    global_context: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        B, T, C = x.shape
        mask = _length_mask(x, lengths)
        total = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        if self.global_context:
            mean = jnp.sum(x * mask, axis=1, keepdims=True) / total
            var = jnp.sum(((x - mean) ** 2) * mask, axis=1, keepdims=True) / total
            std = jnp.sqrt(jnp.clip(var, self.eps, None))
            attn_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
                axis=-1,
            )
        else:
            attn_in = x
        a = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(attn_in, train=train)
        a = jnp.tanh(a)
        a = Conv1d(C, 1, name="conv")(a)
        a = jnp.where(mask > 0, a, -jnp.inf)
        a = jax.nn.softmax(a, axis=1)
        mean = jnp.sum(a * x, axis=1)
        var = jnp.sum(a * (x - mean[:, None, :]) ** 2, axis=1)
        std = jnp.sqrt(jnp.clip(var, self.eps, None))
        return jnp.concatenate([mean, std], axis=-1)[:, None, :]


class SERes2NetBlock(nn.Module):
    """1x1 TDNN -> Res2Net -> 1x1 TDNN -> SE, with residual
    (reference ECAPA_TDNN.py:324)."""

    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = Conv1d(self.out_channels, 1, name="shortcut")(x)
        y = TDNNBlock(self.out_channels, 1, 1, name="tdnn1")(x, train=train)
        y = Res2NetBlock(
            self.out_channels, self.res2net_scale, self.kernel_size, self.dilation,
            name="res2net",
        )(y, train=train)
        y = TDNNBlock(self.out_channels, 1, 1, name="tdnn2")(y, train=train)
        y = SEBlock(self.se_channels, self.out_channels, name="se")(
            y, lengths=lengths, train=train
        )
        return y + residual


class ECAPA_TDNN(nn.Module):
    """The full ECAPA-TDNN: (batch, time, feat) -> (batch, 1, lin_neurons)
    (reference ECAPA_TDNN.py:420).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = ECAPA_TDNN(lin_neurons=192, channels=(64, 64, 64, 64, 192))
    >>> x = jnp.ones((2, 120, 80))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (2, 1, 192)
    """

    lin_neurons: int = 192
    channels: tuple = (512, 512, 512, 512, 1536)
    kernel_sizes: tuple = (5, 3, 3, 3, 1)
    dilations: tuple = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        feats = []
        x = TDNNBlock(
            self.channels[0], self.kernel_sizes[0], self.dilations[0], name="block_0"
        )(x, train=train)
        feats.append(x)
        for i in range(1, len(self.channels) - 1):
            x = SERes2NetBlock(
                self.channels[i],
                res2net_scale=self.res2net_scale,
                se_channels=self.se_channels,
                kernel_size=self.kernel_sizes[i],
                dilation=self.dilations[i],
                name=f"block_{i}",
            )(x, lengths=lengths, train=train)
            feats.append(x)
        # multi-layer feature aggregation over the SERes2Net outputs
        x = jnp.concatenate(feats[1:], axis=-1)
        x = TDNNBlock(
            self.channels[-1], self.kernel_sizes[-1], self.dilations[-1], name="mfa"
        )(x, train=train)
        x = AttentiveStatisticsPooling(
            self.attention_channels, self.global_context, name="asp"
        )(x, lengths=lengths, train=train)
        x = BatchNorm1d(name="asp_bn")(x, train=train)
        x = Conv1d(self.lin_neurons, 1, name="fc")(x)
        return x


class Classifier(nn.Module):
    """Cosine-similarity classifier for AAM-softmax training
    (reference ECAPA_TDNN.py:562): normalized embedding x normalized
    class weights.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> clf = Classifier(out_neurons=100)
    >>> x = jnp.ones((4, 1, 192))
    >>> v = clf.init(jax.random.PRNGKey(0), x, train=False)
    >>> clf.apply(v, x, train=False).shape
    (4, 100)
    """

    out_neurons: int
    lin_blocks: int = 0
    lin_neurons: int = 192

    @nn.compact
    def __call__(self, x, train=True):
        for i in range(self.lin_blocks):
            x = Linear(n_neurons=self.lin_neurons, name=f"linear_{i}")(x)
            x = BatchNorm1d(name=f"norm_{i}")(x, train=train)
        if x.ndim == 3:
            x = x[:, 0, :]
        weight = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.out_neurons),
        )
        x_norm = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w_norm = weight / jnp.maximum(
            jnp.linalg.norm(weight, axis=0, keepdims=True), 1e-12
        )
        return jnp.matmul(x_norm, w_norm)
