"""Conv-TasNet mask network.

Capability parity with the reference's
``speechbrain/lobes/models/conv_tasnet.py`` (MaskNet :175, TemporalBlock,
DepthwiseSeparableConv, ChannelwiseLayerNorm, GlobalLayerNorm): stacked
dilated temporal conv blocks over encoder features producing per-source
masks. Use with dual_path.Encoder/Decoder.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.normalization import GroupNorm, LayerNorm


class ChannelwiseLayerNorm(nn.Module):
    """cLN over the channel axis per frame (reference conv_tasnet.py:24)."""

    @nn.compact
    def __call__(self, x):
        return LayerNorm(name="ln")(x)


class GlobalLayerNorm(nn.Module):
    """gLN over (time, channel) jointly (reference conv_tasnet.py:77)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (C,))
        beta = self.param("beta", nn.initializers.zeros, (C,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) + beta


def _choose_norm(norm_type, name):
    if norm_type == "gLN":
        return GlobalLayerNorm(name=name)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(name=name)
    raise ValueError(f"Unsupported norm {norm_type}")


class TemporalBlock(nn.Module):
    """1x1 conv -> PReLU -> norm -> depthwise separable conv, residual
    (reference conv_tasnet.py:253)."""

    out_channels: int
    kernel_size: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = Conv1d(self.out_channels, 1, bias=False, name="conv1x1")(x)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        y = jnp.where(y >= 0, y, alpha * y)
        y = _choose_norm(self.norm_type, "norm1")(y)
        # depthwise
        y = Conv1d(
            self.out_channels,
            self.kernel_size,
            dilation=self.dilation,
            groups=self.out_channels,
            padding="causal" if self.causal else "same",
            bias=False,
            name="dw",
        )(y)
        alpha2 = self.param("prelu2", nn.initializers.constant(0.25), (1,))
        y = jnp.where(y >= 0, y, alpha2 * y)
        y = _choose_norm(self.norm_type, "norm2")(y)
        y = Conv1d(in_ch, 1, bias=False, name="pointwise")(y)
        return x + y


class MaskNet(nn.Module):
    """Temporal conv mask network (reference conv_tasnet.py:175).

    Input (B, T, N) encoder features -> (num_spks, B, T, N) masks.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = MaskNet(N=8, B=4, H=8, P=3, X=2, R=1, C=2)
    >>> x = jnp.ones((2, 50, 8))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (2, 2, 50, 8)
    """

    N: int  # encoder channels
    B: int  # bottleneck channels
    H: int  # conv block channels
    P: int  # kernel size
    X: int  # blocks per repeat
    R: int  # repeats
    C: int  # number of sources
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, x):
        Bsz, T, N = x.shape
        y = ChannelwiseLayerNorm(name="ln_in")(x)
        y = Conv1d(self.B, 1, bias=False, name="bottleneck")(y)
        for r in range(self.R):
            for b in range(self.X):
                y = TemporalBlock(
                    out_channels=self.H,
                    kernel_size=self.P,
                    dilation=2**b,
                    norm_type=self.norm_type,
                    causal=self.causal,
                    name=f"tcn_{r}_{b}",
                )(y)
        alpha = self.param("prelu_out", nn.initializers.constant(0.25), (1,))
        y = jnp.where(y >= 0, y, alpha * y)
        y = Conv1d(self.C * self.N, 1, bias=False, name="mask_conv")(y)
        y = y.reshape(Bsz, T, self.C, self.N).transpose(0, 2, 1, 3)
        if self.mask_nonlinear == "softmax":
            return jax.nn.softmax(y, axis=1)
        return jax.nn.relu(y)


class Encoder(nn.Module):
    """ConvTasNet adaptive frontend (reference conv_tasnet.py:13):
    (B, T) waveform -> (B, K, N) non-negative basis coefficients with
    50% frame overlap (stride L/2).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = Encoder(L=16, N=8)
    >>> x = jnp.ones((2, 160))
    >>> v = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(v, x).shape
    (2, 19, 8)
    """

    L: int  # frame length (samples)
    N: int  # basis channels

    @nn.compact
    def __call__(self, mixture):
        x = mixture[..., None]  # (B, T, 1)
        y = Conv1d(
            self.N, self.L, stride=self.L // 2, padding="valid",
            bias=False, name="conv1d_U",
        )(x)
        return jax.nn.relu(y)


class Decoder(nn.Module):
    """ConvTasNet decoder (reference conv_tasnet.py:62): masked basis
    coefficients -> waveforms by linear basis + overlap-add.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> dec = Decoder(L=16, N=8)
    >>> w = jnp.ones((2, 19, 8)); m = jnp.ones((2, 2, 19, 8))
    >>> v = dec.init(jax.random.PRNGKey(0), w, m)
    >>> dec.apply(v, w, m).shape
    (2, 160, 2)
    """

    L: int
    N: int

    @nn.compact
    def __call__(self, mixture_w, est_mask):
        # mixture_w (B, K, N); est_mask (B, C, K, N)
        from speechbrain_tpu.processing.signal_processing import (
            overlap_and_add,
        )

        source_w = mixture_w[:, None] * est_mask  # (B, C, K, N)
        frames = nn.Dense(self.L, use_bias=False, name="basis_signals")(
            source_w
        )  # (B, C, K, L)
        Bsz, C, K, L = frames.shape
        est = overlap_and_add(frames.reshape(Bsz * C, K, L), self.L // 2)
        est = est.reshape(Bsz, C, -1)
        return jnp.moveaxis(est, 1, 2)  # (B, T, C)


class ConvTasNetWrapper(nn.Module):
    """Encoder + MaskNet + Decoder, end-to-end waveform separation with
    the same (mix (B, T)) -> (est (B, T, num_spks)) surface as
    SepformerWrapper (the ConvTasNet recipe composition; reference
    recipes/WSJ0Mix/separation/train.py wires the three modules the same
    way).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = ConvTasNetWrapper(L=16, N=8, B=4, H=8, P=3, X=2, R=1,
    ...                           num_spks=2)
    >>> x = jnp.ones((1, 800))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (1, 800, 2)
    """

    L: int = 16
    N: int = 512
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    num_spks: int = 2
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, mix, train=False):
        T_origin = mix.shape[1]
        w = Encoder(L=self.L, N=self.N, name="encoder")(mix)
        masks = MaskNet(
            N=self.N, B=self.B, H=self.H, P=self.P, X=self.X, R=self.R,
            C=self.num_spks, norm_type=self.norm_type, causal=self.causal,
            mask_nonlinear=self.mask_nonlinear, name="masknet",
        )(w)
        est = Decoder(L=self.L, N=self.N, name="decoder")(w, masks)
        T_est = est.shape[1]
        if T_est >= T_origin:
            return est[:, :T_origin]
        return jnp.pad(est, ((0, 0), (0, T_origin - T_est), (0, 0)))


class BinauralConvTasNetWrapper(nn.Module):
    """Binaural (stereo) ConvTasNet with the three interaural
    communication schemes of the reference's BinauralWSJ0Mix recipe
    (ref recipes/BinauralWSJ0Mix/separation/train.py:91-160):

    * ``independent`` — each ear gets its own encoder + masknet.
    * ``parallel`` — each masknet sees the concatenated (L, R) encoder
      features and emits masks for both ears; per-ear estimates are the
      sum of both masknets' contributions for that ear.
    * ``cross`` — ILD features (log-magnitude ratio of the two ears'
      STFTs) are projected and concatenated to each ear's encoding (the
      right ear sees the negated ILD). The projection is a learned 1x1
      conv held in the module (the reference constructs it per forward
      call, which never trains it; registering it is the fix).

    Input (B, T, 2) stereo mixture -> (B, T, 2, num_spks) estimates.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = BinauralConvTasNetWrapper(L=16, N=8, B=4, H=8, P=3,
    ...     X=1, R=1, num_spks=2, mode="parallel")
    >>> x = jnp.ones((1, 800, 2))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (1, 800, 2, 2)
    """

    L: int = 16
    N: int = 128
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    num_spks: int = 2
    mode: str = "parallel"  # "parallel" | "cross" | "independent"
    sample_rate: int = 8000
    norm_type: str = "gLN"

    def _masknet(self, name, in_N, out_mult):
        return MaskNet(
            N=in_N, B=self.B, H=self.H, P=self.P, X=self.X, R=self.R,
            C=self.num_spks * out_mult, norm_type=self.norm_type,
            name=name,
        )

    def _ild(self, mix):
        """Interaural level difference (B, frames, n_fft//2+1)."""
        from speechbrain_tpu.processing.features import (
            STFT,
            spectral_magnitude,
        )

        eps = 1e-8
        stft = STFT(
            sample_rate=self.sample_rate,
            win_length=256 * 1000.0 / self.sample_rate,
            hop_length=128 * 1000.0 / self.sample_rate,
            n_fft=256,
        )
        mag_l = spectral_magnitude(stft(mix[..., 0]), power=0.5)
        mag_r = spectral_magnitude(stft(mix[..., 1]), power=0.5)
        return 10.0 * jnp.log10(mag_l / (mag_r + eps) + eps)

    @nn.compact
    def __call__(self, mix, train=False):
        import jax

        T_origin = mix.shape[1]
        enc_l = Encoder(L=self.L, N=self.N, name="encoder_l")
        enc_r = Encoder(L=self.L, N=self.N, name="encoder_r")
        dec_l = Decoder(L=self.L, N=self.N, name="decoder_l")
        dec_r = Decoder(L=self.L, N=self.N, name="decoder_r")
        wl = enc_l(mix[..., 0])  # (B, K, N)
        wr = enc_r(mix[..., 1])

        if self.mode == "independent":
            ml = self._masknet("masknet_l", self.N, 1)(wl)
            mr = self._masknet("masknet_r", self.N, 1)(wr)
            est_l = dec_l(wl, ml)
            est_r = dec_r(wr, mr)
        elif self.mode == "cross":
            ild = self._ild(mix)  # (B, frames, F)
            ild = jax.image.resize(
                ild, (ild.shape[0], wl.shape[1], ild.shape[2]), "linear"
            )
            ild = Conv1d(self.N, 1, name="ild_proj")(ild)  # (B, K, N)
            ml = self._masknet("masknet_l", 2 * self.N, 1)(
                jnp.concatenate([wl, ild], axis=-1)
            )[..., : self.N]
            mr = self._masknet("masknet_r", 2 * self.N, 1)(
                jnp.concatenate([wr, -ild], axis=-1)
            )[..., : self.N]
            est_l = dec_l(wl, ml)
            est_r = dec_r(wr, mr)
        else:  # parallel
            cat_l = jnp.concatenate([wl, wr], axis=-1)  # same-index ears
            mask_l = self._masknet("masknet_l", 2 * self.N, 1)(cat_l)
            wl2 = enc_r(mix[..., 0])
            wr2 = enc_l(mix[..., 1])
            cat_r = jnp.concatenate([wl2, wr2], axis=-1)
            mask_r = self._masknet("masknet_r", 2 * self.N, 1)(cat_r)
            sep_l = (
                wl[:, None] * mask_l[..., : self.N]
                + wl2[:, None] * mask_r[..., : self.N]
            )
            sep_r = (
                wr[:, None] * mask_l[..., self.N:]
                + wr2[:, None] * mask_r[..., self.N:]
            )
            # sep_* are already masked features: decode them against a
            # unit mixture so the decoder only applies the basis
            est_l = dec_l(jnp.ones_like(wl), sep_l)
            est_r = dec_r(jnp.ones_like(wr), sep_r)
        est = jnp.stack([est_l, est_r], axis=2)  # (B, T, 2, C)
        T_est = est.shape[1]
        if T_est >= T_origin:
            return est[:, :T_origin]
        return jnp.pad(
            est, ((0, 0), (0, T_origin - T_est), (0, 0), (0, 0))
        )
