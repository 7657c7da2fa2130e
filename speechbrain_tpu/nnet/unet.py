"""UNet for diffusion models.

Capability parity with the reference's ``speechbrain/nnet/unet.py``
(UNetModel family, timestep embedding, res blocks with up/down sampling,
attention blocks): a 2-D UNet over (batch, time, freq, channel) maps with
diffusion-timestep conditioning, used by diffusion-based enhancement/TTS.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import GroupNorm


def timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal diffusion-step embedding (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResBlock(nn.Module):
    """GN -> SiLU -> conv, with timestep-embedding shift, residual."""

    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm(num_groups=min(8, x.shape[-1]), name="norm1")(x)
        h = jax.nn.silu(h)
        h = Conv2d(self.out_channels, (3, 3), name="conv1")(h)
        emb_out = Linear(self.out_channels, name="emb_proj")(jax.nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm(num_groups=min(8, self.out_channels), name="norm2")(h)
        h = jax.nn.silu(h)
        h = Conv2d(self.out_channels, (3, 3), name="conv2")(h)
        skip = x
        if x.shape[-1] != self.out_channels:
            skip = Conv2d(self.out_channels, (1, 1), name="skip")(x)
        return skip + h


class AttentionBlock2d(nn.Module):
    """Self-attention over the flattened spatial grid."""

    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        from speechbrain_tpu.nnet.attention import MultiheadAttention

        B, T, F, C = x.shape
        flat = x.reshape(B, T * F, C)
        h = MultiheadAttention(nhead=self.num_heads, d_model=C, name="attn")(
            flat, flat, flat
        )[0]
        return x + h.reshape(B, T, F, C)


class Downsample(nn.Module):
    """Strided-conv 2x spatial downsampling."""

    @nn.compact
    def __call__(self, x):
        return Conv2d(x.shape[-1], (3, 3), stride=(2, 2), name="op")(x)


class Upsample(nn.Module):
    """Nearest-neighbour 2x upsampling + conv."""

    @nn.compact
    def __call__(self, x):
        B, T, F, C = x.shape
        x = jax.image.resize(x, (B, T * 2, F * 2, C), "nearest")
        return Conv2d(C, (3, 3), name="op")(x)


class UNetModel(nn.Module):
    """Diffusion UNet: (B, T, F, in_ch) + timesteps -> (B, T, F, out_ch)
    (reference nnet/unet.py UNetModel).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = UNetModel(in_channels=1, model_channels=8, out_channels=1,
    ...     num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2))
    >>> x = jnp.ones((1, 16, 16, 1))
    >>> t = jnp.zeros((1,), jnp.int32)
    >>> v = net.init(jax.random.PRNGKey(0), x, t)
    >>> net.apply(v, x, t).shape
    (1, 16, 16, 1)
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int = 2
    attention_resolutions: tuple = (8,)
    channel_mult: tuple = (1, 2, 4)
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, timesteps, cond=None):
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = Linear(4 * self.model_channels, name="emb1")(emb)
        emb = Linear(4 * self.model_channels, name="emb2")(jax.nn.silu(emb))
        if cond is not None:
            emb = emb + cond

        h = Conv2d(self.model_channels, (3, 3), name="in_conv")(x)
        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            ch = self.model_channels * mult
            for b in range(self.num_res_blocks):
                h = ResBlock(out_channels=ch, name=f"down_{level}_{b}")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlock2d(
                        num_heads=self.num_heads, name=f"down_attn_{level}_{b}"
                    )(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(name=f"down_samp_{level}")(h)
                skips.append(h)
                ds *= 2
        h = ResBlock(out_channels=h.shape[-1], name="mid1")(h, emb)
        h = AttentionBlock2d(num_heads=self.num_heads, name="mid_attn")(h)
        h = ResBlock(out_channels=h.shape[-1], name="mid2")(h, emb)
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = self.model_channels * mult
            for b in range(self.num_res_blocks + 1):
                skip = skips.pop()
                # odd spatial dims upsample one past the skip; crop to
                # the skip's grid (standard UNet robustness)
                h = h[:, : skip.shape[1], : skip.shape[2]]
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(out_channels=ch, name=f"up_{level}_{b}")(h, emb)
            if level != 0:
                h = Upsample(name=f"up_samp_{level}")(h)
                ds //= 2
        h = GroupNorm(num_groups=min(8, h.shape[-1]), name="out_norm")(h)
        h = jax.nn.silu(h)
        return Conv2d(self.out_channels, (3, 3), name="out_conv")(h)


class EncoderUNetModel(nn.Module):
    """Encoder half only (for representation / classifier guidance)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int = 2
    channel_mult: tuple = (1, 2, 4)

    @nn.compact
    def __call__(self, x, timesteps):
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = Linear(4 * self.model_channels, name="emb1")(emb)
        h = Conv2d(self.model_channels, (3, 3), name="in_conv")(x)
        for level, mult in enumerate(self.channel_mult):
            ch = self.model_channels * mult
            for b in range(self.num_res_blocks):
                h = ResBlock(out_channels=ch, name=f"down_{level}_{b}")(h, emb)
            if level != len(self.channel_mult) - 1:
                h = Downsample(name=f"down_samp_{level}")(h)
        h = jnp.mean(h, axis=(1, 2))
        return Linear(self.out_channels, name="out")(h)


class UNetNormalizingAutoencoder(nn.Module):
    """Conv autoencoder for latent diffusion with a normalized latent
    space (reference nnet/unet.py UNetNormalizingAutoencoder, used by
    recipes/AudioMNIST/diffusion/hparams/train_latent.yaml): a
    downsampling conv encoder to ``encoder_out_channels`` latent maps,
    normalized to (norm_mean, norm_std), and an upsampling decoder back
    to the input plane.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> ae = UNetNormalizingAutoencoder(in_channels=1, model_channels=8,
    ...     encoder_out_channels=4, out_channels=1, channel_mult=(1, 2))
    >>> x = jnp.ones((2, 16, 16, 1))
    >>> v = ae.init(jax.random.PRNGKey(0), x)
    >>> z = ae.apply(v, x, method="encode")
    >>> z.shape
    (2, 4, 4, 4)
    >>> ae.apply(v, z, method="decode").shape
    (2, 16, 16, 1)
    """

    in_channels: int = 1
    model_channels: int = 32
    encoder_out_channels: int = 4
    out_channels: int = 1
    channel_mult: tuple = (1, 2)
    norm_mean: float = 0.0
    norm_std: float = 1.0

    def setup(self):
        import flax.linen as fnn

        self.enc_in = Conv2d(self.model_channels, (3, 3), name="enc_in")
        self.enc_stages = [
            fnn.Conv(self.model_channels * mult, (4, 4), strides=(2, 2),
                     padding="SAME", name=f"enc_{level}")
            for level, mult in enumerate(self.channel_mult)
        ]
        self.enc_out = Conv2d(self.encoder_out_channels, (3, 3),
                              name="enc_out")
        self.dec_in = Conv2d(
            self.model_channels * self.channel_mult[-1], (3, 3),
            name="dec_in",
        )
        self.dec_stages = [
            fnn.ConvTranspose(self.model_channels * mult, (4, 4),
                              strides=(2, 2), padding="SAME",
                              name=f"dec_{level}")
            for level, mult in enumerate(reversed(self.channel_mult))
        ]
        self.dec_out = Conv2d(self.out_channels, (3, 3), name="dec_out")

    def encode(self, x):
        h = self.enc_in(x)
        for stage in self.enc_stages:
            h = jax.nn.silu(stage(h))
        z = self.enc_out(h)
        mean = jnp.mean(z, axis=(1, 2, 3), keepdims=True)
        std = jnp.std(z, axis=(1, 2, 3), keepdims=True) + 1e-8
        return (z - mean) / std * self.norm_std + self.norm_mean

    def decode(self, z):
        h = self.dec_in(z)
        for stage in self.dec_stages:
            h = jax.nn.silu(stage(h))
        return self.dec_out(h)

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z), z
