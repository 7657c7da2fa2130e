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

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear


def diffusion_step_embedding(t, dim=128):
    """Sinusoidal embedding of the diffusion step (B,) -> (B, dim), with
    the reference's frequency table ``t * 10^(d * 4 / 63)`` for d in
    [0, 64) (ref DiffWave.py:186-203 _build_embedding) — NOT the
    transformer-style 1/10000^(d/half) table. Float steps interpolate
    between the integer table rows exactly like the reference's
    ``_lerp_embedding`` (ref :168)."""
    half = dim // 2
    freqs = 10.0 ** (jnp.arange(half) * 4.0 / (half - 1))

    def table_row(step):
        args = step[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)

    if jnp.issubdtype(jnp.asarray(t).dtype, jnp.integer):
        return table_row(t)
    low = jnp.floor(t)
    high = jnp.ceil(t)
    low_e, high_e = table_row(low), table_row(high)
    return low_e + (high_e - low_e) * (t - low)[:, None]


class SpectrogramUpsampler(nn.Module):
    """256x time upsampling of the mel conditioner: two 2-D transposed
    convolutions with kernels (3, 32) over (mel, time), stride (1, 16),
    padding (1, 8), leaky-relu(0.4) after each — the exact reference
    topology (ref DiffWave.py:205-248) so published checkpoints pour 1:1.

    Takes/returns feature-last layouts: (B, T_mel, M) -> (B, 256*T_mel, M).
    Kernels are stored as (kH, kW, 1, 1) in (mel, time) spatial order;
    the torch ConvTranspose2d weight (1, 1, 3, 32) pours with a
    (2, 3, 0, 1) transpose (see utils/torch_convert.diffwave_key_map)."""

    @nn.compact
    def __call__(self, mel):
        x = mel.transpose(0, 2, 1)[..., None]  # (B, M, T, 1)
        for name in ("conv1", "conv2"):
            w = self.param(
                f"{name}_kernel", nn.initializers.lecun_normal(),
                (3, 32, 1, 1),
            )
            b = self.param(f"{name}_bias", nn.initializers.zeros, (1,))
            # torch ConvTranspose2d(stride=(1,16), padding=(1,8)) ==
            # input dilated by stride, padded k-1-p per side, correlated
            # with the spatially-flipped kernel
            x = jax.lax.conv_general_dilated(
                x, jnp.flip(w, axis=(0, 1)),
                window_strides=(1, 1),
                padding=[(1, 1), (23, 23)],
                lhs_dilation=(1, 16),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.leaky_relu(x, 0.4)
        return x[..., 0].transpose(0, 2, 1)


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

    @nn.compact
    def __call__(self, audio, diffusion_step, mel=None):
        x = audio[..., None]
        x = jax.nn.relu(Conv1d(self.residual_channels, 1, name="in_proj")(x))
        emb = diffusion_step_embedding(diffusion_step, 128)
        emb = jax.nn.silu(Linear(512, name="emb1")(emb))
        emb = jax.nn.silu(Linear(512, name="emb2")(emb))
        conditioner = None
        if not self.unconditional and mel is not None:
            conditioner = SpectrogramUpsampler(name="upsampler")(mel)
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
