"""Classic spectral-mask speech-enhancement baselines.

Capability parity with the model stacks the reference assembles inline in
its enhancement recipe configs (ref
``recipes/WHAMandWHAMR/enhancement/hparams/models/{BLSTM,2DFCN,
2DFCN+BLSTM}.yaml`` and the identical Voicebank family): a (B, T, F)
magnitude spectrogram in, a (B, T, F) sigmoid mask out. The reference
builds these as YAML ``Sequential`` stacks of torch layers; here each
baseline is one compact flax module (the repo idiom — shape inference is
inherent, and the recurrent layers return carries that a generic
Sequential cannot chain).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.RNN import LSTM
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm2d


class WaveFCNMapper(nn.Module):
    """Fully-convolutional waveform-to-waveform enhancement baseline
    (Fu 2018, TASLP): ``num_blocks`` conv1d+InstanceNorm+LeakyReLU
    stages over the raw wave, then a single-channel tanh-free linear
    conv head (the reference's ``Voicebank/enhance/waveform_map/
    hparams/models/FCN.yaml`` stack).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = WaveFCNMapper(base_channels=4, num_blocks=2, kernel_size=7)
    >>> x = jnp.ones((2, 64))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (2, 64)
    """

    base_channels: int = 80
    num_blocks: int = 8
    kernel_size: int = 55

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.CNN import Conv1d
        from speechbrain_tpu.nnet.normalization import InstanceNorm1d

        squeeze = x.ndim == 2
        h = x[..., None] if squeeze else x
        h = InstanceNorm1d(affine=True, name="in0")(h)
        for i in range(self.num_blocks):
            h = Conv1d(
                out_channels=self.base_channels,
                kernel_size=self.kernel_size,
                name=f"conv{i + 1}",
            )(h)
            h = InstanceNorm1d(affine=True, name=f"in{i + 1}")(h)
            h = nn.leaky_relu(h, negative_slope=0.3)
        h = Conv1d(out_channels=1, kernel_size=self.kernel_size,
                   name="head")(h)
        return h[..., 0] if squeeze else h


class BLSTMMasker(nn.Module):
    """BLSTM SE baseline (Fu 2020): 2-layer BLSTM -> Linear -> LeakyReLU
    -> Linear -> sigmoid mask.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = BLSTMMasker(n_freq=33, hidden_size=8, lin_size=12)
    >>> x = jnp.ones((2, 10, 33))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (2, 10, 33)
    """

    n_freq: int = 257
    hidden_size: int = 200
    num_layers: int = 2
    lin_size: int = 300

    @nn.compact
    def __call__(self, x, train=False):
        out, _ = LSTM(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=True,
            name="blstm",
        )(x, train=train)
        out = Linear(self.lin_size, name="lin1")(out)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = Linear(self.n_freq, name="lin2")(out)
        return nn.sigmoid(out)


class FCN2DMasker(nn.Module):
    """2-D FCN SE baseline (Fu 2020): ``num_blocks`` conv(9x9)+BN+
    LeakyReLU stages over the (T, F) plane, then a full-frequency-span
    projection (the reference's valid conv with kernel (F, 1)) to a
    sigmoid mask.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = FCN2DMasker(n_freq=17, base_channels=4, num_blocks=2)
    >>> x = jnp.ones((2, 6, 17))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> out, _ = net.apply(v, x, mutable=["batch_stats"])
    >>> out.shape
    (2, 6, 17)
    """

    n_freq: int = 257
    base_channels: int = 64
    num_blocks: int = 7
    kernel_size: tuple = (9, 9)

    @nn.compact
    def __call__(self, x, train=False):
        h = x[..., None]
        for i in range(self.num_blocks):
            h = Conv2d(
                out_channels=self.base_channels,
                kernel_size=self.kernel_size,
                name=f"conv{i + 1}",
            )(h)
            h = BatchNorm2d(name=f"bn{i + 1}")(h, train=train)
            h = nn.leaky_relu(h, negative_slope=0.01)
        # full-frequency-span projection == valid conv with kernel (F, 1)
        B, T = h.shape[0], h.shape[1]
        h = h.reshape(B, T, -1)
        h = Linear(self.n_freq, name="freq_proj")(h)
        return nn.sigmoid(h)


class FCN2DBLSTMMasker(nn.Module):
    """2DFCN+BLSTM SE baseline: the FCN's conv stack feeding the BLSTM
    masker (the reference's combined ``2DFCN+BLSTM.yaml`` stack).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = FCN2DBLSTMMasker(n_freq=17, base_channels=4, num_blocks=2,
    ...                        hidden_size=8, lin_size=12)
    >>> x = jnp.ones((2, 6, 17))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> out, _ = net.apply(v, x, mutable=["batch_stats"])
    >>> out.shape
    (2, 6, 17)
    """

    n_freq: int = 257
    base_channels: int = 64
    num_blocks: int = 4
    kernel_size: tuple = (9, 9)
    hidden_size: int = 200
    num_layers: int = 2
    lin_size: int = 300

    @nn.compact
    def __call__(self, x, train=False):
        h = x[..., None]
        for i in range(self.num_blocks):
            h = Conv2d(
                out_channels=self.base_channels,
                kernel_size=self.kernel_size,
                name=f"conv{i + 1}",
            )(h)
            h = BatchNorm2d(name=f"bn{i + 1}")(h, train=train)
            h = nn.leaky_relu(h, negative_slope=0.01)
        B, T = h.shape[0], h.shape[1]
        h = Linear(self.n_freq, name="bottleneck")(h.reshape(B, T, -1))
        out, _ = LSTM(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=True,
            name="blstm",
        )(h, train=train)
        out = Linear(self.lin_size, name="lin1")(out)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = Linear(self.n_freq, name="lin2")(out)
        return nn.sigmoid(out)
