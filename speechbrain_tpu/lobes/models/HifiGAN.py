"""HiFi-GAN vocoder: generator, discriminators, losses.

Capability parity with the reference's
``speechbrain/lobes/models/HifiGAN.py`` (mel_spectogram :51,
HifiganGenerator :371, UnitHifiganGenerator :632, multi-period/multi-scale
discriminators :1008/:1102, generator/discriminator losses): mel -> wav
synthesis with multi-receptive-field resblocks, periods/scales
discriminators, LSGAN + feature-matching + L1-mel objectives.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.CNN import Conv1d, Conv2d, ConvTranspose1d


def mel_spectogram(
    audio=None, *, sample_rate, hop_length, win_length, n_fft, n_mels,
    f_min, f_max, power, normalized, norm, mel_scale, compression,
):
    """Mel features for vocoder training (reference HifiGAN.py:51):
    slaney-style options approximated with the toolkit mel + log compression.
    """
    from speechbrain_tpu.processing.features import (
        STFT,
        Filterbank,
        spectral_magnitude,
    )

    stft = STFT(
        sample_rate=sample_rate,
        win_length=win_length * 1000.0 / sample_rate,
        hop_length=hop_length * 1000.0 / sample_rate,
        n_fft=n_fft,
        window_fn="hann",
    )
    fb = Filterbank(
        n_mels=n_mels, n_fft=n_fft, sample_rate=sample_rate, f_min=f_min,
        f_max=f_max, log_mel=False,
    )
    ps = stft.power(audio)
    if power != 2:
        ps = ps ** (power / 2.0)
    mel = fb(ps)
    if compression:
        mel = jnp.log(jnp.clip(mel, a_min=1e-5))
    return mel


def _prelu(module, x, name):
    alpha = module.param(name, nn.initializers.constant(0.25), (1,))
    return jnp.where(x >= 0, x, alpha * x)


class ResBlock1(nn.Module):
    """MRF residual block type 1 (3 dilated + 3 plain convs)
    (reference HifiGAN.py:150)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            y = jax.nn.leaky_relu(x, 0.1)
            y = Conv1d(self.channels, self.kernel_size, dilation=d,
                       name=f"conv1_{i}")(y)
            y = jax.nn.leaky_relu(y, 0.1)
            y = Conv1d(self.channels, self.kernel_size, dilation=1,
                       name=f"conv2_{i}")(y)
            x = x + y
        return x


class ResBlock2(nn.Module):
    """MRF residual block type 2 (2 dilated convs)
    (reference HifiGAN.py:260)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            y = jax.nn.leaky_relu(x, 0.1)
            y = Conv1d(self.channels, self.kernel_size, dilation=d,
                       name=f"conv_{i}")(y)
            x = x + y
        return x


class HifiganGenerator(nn.Module):
    """Mel (B, T, n_mel) -> waveform (B, T*prod(strides))
    (reference HifiGAN.py:371).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> g = HifiganGenerator(in_channels=80, out_channels=1,
    ...     resblock_type="1", resblock_dilation_sizes=((1, 3, 5),),
    ...     resblock_kernel_sizes=(3,), upsample_kernel_sizes=(16, 16),
    ...     upsample_initial_channel=32, upsample_factors=(8, 8))
    >>> x = jnp.ones((1, 20, 80))
    >>> v = g.init(jax.random.PRNGKey(0), x)
    >>> g.apply(v, x).shape
    (1, 1280)
    """

    in_channels: int = 80
    out_channels: int = 1
    resblock_type: str = "1"
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: tuple = (3, 7, 11)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: tuple = (8, 8, 2, 2)
    inference_padding: int = 5
    cond_channels: int = 0
    conv_post_bias: bool = True

    @nn.compact
    def __call__(self, x, g=None):
        # x: (B, T, in_channels)
        y = Conv1d(self.upsample_initial_channel, 7, name="conv_pre")(x)
        if g is not None:
            y = y + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)
        ch = self.upsample_initial_channel
        resblock = ResBlock1 if self.resblock_type == "1" else ResBlock2
        for i, (u, k) in enumerate(
            zip(self.upsample_factors, self.upsample_kernel_sizes)
        ):
            y = jax.nn.leaky_relu(y, 0.1)
            ch = ch // 2
            y = ConvTranspose1d(
                out_channels=ch, kernel_size=k, stride=u,
                padding=(k - u) // 2, name=f"up_{i}",
            )(y)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                z = resblock(channels=ch, kernel_size=rk, dilation=tuple(rd),
                             name=f"res_{i}_{j}")(y)
                acc = z if acc is None else acc + z
            y = acc / len(self.resblock_kernel_sizes)
        # the reference's final pre-conv_post activation uses torch's
        # DEFAULT leaky slope 0.01, not LRELU_SLOPE (ref HifiGAN.py:146)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv1d(self.out_channels, 7, bias=self.conv_post_bias,
                   name="conv_post")(y)
        y = jnp.tanh(y)
        return y[..., 0] if self.out_channels == 1 else y


class UnitHifiganGenerator(HifiganGenerator):
    """Discrete-unit vocoder: embeds unit ids then synthesizes
    (reference HifiGAN.py:632)."""

    num_embeddings: int = 100
    embedding_dim: int = 128
    duration_predictor: bool = False

    @nn.compact
    def __call__(self, units, g=None, spk=None):
        from speechbrain_tpu.nnet.embedding import Embedding

        x = Embedding(
            num_embeddings=self.num_embeddings,
            embedding_dim=self.embedding_dim,
            name="unit_emb",
        )(units)
        if spk is not None:
            # multi-speaker conditioning (reference HifiGAN.py:632 with
            # multispeaker=True): the utterance-level speaker embedding
            # is broadcast along time and concatenated to every frame
            spk_t = jnp.broadcast_to(
                spk[:, None, :], (x.shape[0], x.shape[1], spk.shape[-1])
            )
            x = jnp.concatenate([x, spk_t], axis=-1)
        return super().__call__(x, g=g)


class DiscriminatorP(nn.Module):
    """One period discriminator (reference HifiGAN.py:1008)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        # x: (B, T) -> (B, T/p, p, 1) 2D view
        B, T = x.shape[:2]
        if x.ndim == 3:
            x = x[..., 0]
        pad = (-T) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect" if pad < T else "constant")
        T2 = x.shape[1]
        y = x.reshape(B, T2 // self.period, self.period, 1)
        feats = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            y = Conv2d(ch, (self.kernel_size, 1), stride=(self.stride, 1),
                       name=f"conv_{i}")(y)
            y = jax.nn.leaky_relu(y, 0.1)
            feats.append(y)
        y = Conv2d(1024, (self.kernel_size, 1), name="conv_4")(y)
        y = jax.nn.leaky_relu(y, 0.1)
        feats.append(y)
        y = Conv2d(1, (3, 1), name="conv_post")(y)
        feats.append(y)
        return y.reshape(B, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    """Periods (2, 3, 5, 7, 11) (reference HifiGAN.py:1061)."""

    periods: tuple = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for p in self.periods:
            s, f = DiscriminatorP(period=p, name=f"disc_p{p}")(x)
            scores.append(s)
            feats.append(f)
        return scores, feats


class DiscriminatorS(nn.Module):
    """One scale discriminator (reference HifiGAN.py:1102)."""

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        feats = []
        chs = (128, 128, 256, 512, 1024, 1024, 1024)
        ks = (15, 41, 41, 41, 41, 41, 5)
        ss = (1, 2, 2, 4, 4, 1, 1)
        gs = (1, 4, 16, 16, 16, 16, 1)
        y = x
        for i, (c, k, s, g) in enumerate(zip(chs, ks, ss, gs)):
            y = Conv1d(c, k, stride=s, groups=min(g, y.shape[-1]),
                       name=f"conv_{i}")(y)
            y = jax.nn.leaky_relu(y, 0.1)
            feats.append(y)
        y = Conv1d(1, 3, name="conv_post")(y)
        feats.append(y)
        return y.reshape(x.shape[0], -1), feats


class MultiScaleDiscriminator(nn.Module):
    """3 scales with avg-pool downsampling (reference HifiGAN.py:1155)."""

    @nn.compact
    def __call__(self, x):
        from speechbrain_tpu.nnet.pooling import Pooling1d

        scores, feats = [], []
        y = x[..., None] if x.ndim == 2 else x
        for i in range(3):
            s, f = DiscriminatorS(name=f"disc_s{i}")(y)
            scores.append(s)
            feats.append(f)
            if i < 2:
                y = Pooling1d("avg", 4, stride=2, padding=1)(y)
        return scores, feats


class HifiganDiscriminator(nn.Module):
    """MPD + MSD combined (reference HifiGAN.py:1190)."""

    @nn.compact
    def __call__(self, x):
        s1, f1 = MultiPeriodDiscriminator(name="mpd")(x)
        s2, f2 = MultiScaleDiscriminator(name="msd")(x)
        return s1 + s2, f1 + f2


# ---------------------------------------------------------------------------
# Losses (reference HifiGAN.py:1230-1420)
# ---------------------------------------------------------------------------

def generator_adv_loss(scores_fake):
    """LSGAN generator loss: mean((1 - D(G))^2)."""
    return sum(jnp.mean((1.0 - s) ** 2) for s in scores_fake) / len(scores_fake)


def discriminator_loss(scores_fake, scores_real):
    """LSGAN discriminator loss."""
    loss = 0.0
    for sf, sr in zip(scores_fake, scores_real):
        loss = loss + jnp.mean((1.0 - sr) ** 2) + jnp.mean(sf**2)
    return loss / len(scores_fake)


def feature_loss(feats_fake, feats_real):
    """L1 feature matching over all discriminator layers."""
    loss = 0.0
    count = 0
    for ff, fr in zip(feats_fake, feats_real):
        for a, b in zip(ff, fr):
            loss = loss + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
            count += 1
    return loss / max(count, 1)


def mel_loss(y_hat, y, mel_fn):
    """L1 between mel spectrograms of generated and real audio."""
    return jnp.mean(jnp.abs(mel_fn(y_hat) - mel_fn(y)))
