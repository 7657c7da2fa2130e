"""DiffWave diffusion vocoder.

Capability parity with the reference's
``speechbrain/lobes/models/DiffWave.py``: dilated-residual WaveNet-style
denoiser conditioned on a diffusion-step embedding + upsampled mel, used
with nnet.diffusion.DenoisingDiffusion for training/sampling.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d
from speechbrain_tpu.nnet.linear import Linear


def diffusion_step_embedding(t, dim=128):
    """Sinusoidal embedding of the diffusion step (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half) / (half - 1)
    )
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class SpectrogramUpsampler(nn.Module):
    """2x ConvTranspose over time to reach the audio rate."""

    stride1: int = 16
    stride2: int = 16

    @nn.compact
    def __call__(self, mel):
        # mel (B, T, M) -> (B, T*stride1*stride2, M)
        y = ConvTranspose1d(
            out_channels=mel.shape[-1], kernel_size=2 * self.stride1,
            stride=self.stride1, padding=self.stride1 // 2, name="up1",
        )(mel)
        y = jax.nn.leaky_relu(y, 0.4)
        y = ConvTranspose1d(
            out_channels=mel.shape[-1], kernel_size=2 * self.stride2,
            stride=self.stride2, padding=self.stride2 // 2, name="up2",
        )(y)
        return jax.nn.leaky_relu(y, 0.4)


class ResidualBlock(nn.Module):
    """Gated dilated conv with conditioner + step embedding."""

    residual_channels: int = 64
    dilation: int = 1

    @nn.compact
    def __call__(self, x, step_emb, conditioner=None):
        C = self.residual_channels
        y = x + Linear(C, name="step_proj")(step_emb)[:, None, :]
        y = Conv1d(2 * C, 3, dilation=self.dilation, name="dilated")(y)
        if conditioner is not None:
            y = y + Conv1d(2 * C, 1, name="cond")(conditioner)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = Conv1d(2 * C, 1, name="out")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffWave(nn.Module):
    """The DiffWave denoiser: (noisy_audio, t, mel) -> predicted noise.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = DiffWave(residual_layers=2, residual_channels=8,
    ...     dilation_cycle_length=2, unconditional=True)
    >>> x = jnp.ones((2, 256))
    >>> t = jnp.zeros((2,), jnp.int32)
    >>> v = net.init(jax.random.PRNGKey(0), x, t)
    >>> net.apply(v, x, t).shape
    (2, 256)
    """

    residual_layers: int = 30
    residual_channels: int = 64
    dilation_cycle_length: int = 10
    total_steps: int = 50
    unconditional: bool = False
    upsample_strides: tuple = (16, 16)

    @nn.compact
    def __call__(self, audio, diffusion_step, mel=None):
        x = audio[..., None]
        x = jax.nn.relu(Conv1d(self.residual_channels, 1, name="in_proj")(x))
        emb = diffusion_step_embedding(diffusion_step, 128)
        emb = jax.nn.silu(Linear(512, name="emb1")(emb))
        emb = jax.nn.silu(Linear(512, name="emb2")(emb))
        conditioner = None
        if not self.unconditional and mel is not None:
            conditioner = SpectrogramUpsampler(
                stride1=self.upsample_strides[0],
                stride2=self.upsample_strides[1],
                name="upsampler",
            )(mel)
            conditioner = conditioner[:, : audio.shape[1], :]
        skips = None
        for i in range(self.residual_layers):
            dilation = 2 ** (i % self.dilation_cycle_length)
            x, skip = ResidualBlock(
                residual_channels=self.residual_channels,
                dilation=dilation,
                name=f"res_{i}",
            )(x, emb, conditioner)
            skips = skip if skips is None else skips + skip
        y = skips / math.sqrt(self.residual_layers)
        y = jax.nn.relu(Conv1d(self.residual_channels, 1, name="skip_proj")(y))
        y = Conv1d(1, 1, name="out_proj")(y)
        return y[..., 0]
