"""Fused Pallas mel-frontend kernel.

Replaces the reference's STFT -> |.|^2 -> mel -> dB chain
(``speechbrain/processing/features.py:58-760``) with ONE kernel per
(batch row, frame block): the waveform block is DMA'd to VMEM once,
framed in-register, transformed by a window-folded real DFT (two MXU
matmuls), squared, mel-projected (third matmul) and log-compressed —
no frames / power-spectrum intermediates ever hit HBM.

The per-sequence top_db clamp needs a global max over frames, so it is
applied outside on the (small) output.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mel_kernel(
    x_hbm, cos_ref, sin_ref, mel_ref, out_ref, frames_scratch, x_vmem, sem,
    *, frames_per_block, n_fft, hop, n_freq, n_mels, amin, multiplier, db_offset,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    block_wav = (frames_per_block - 1) * hop + n_fft
    # DMA the (overlapping) wav block for this frame block into VMEM
    start = j * frames_per_block * hop
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start, block_wav)], x_vmem, sem
    )
    dma.start()
    dma.wait()

    def fill_frame(i, _):
        frames_scratch[i, :] = x_vmem[pl.ds(i * hop, n_fft)]
        return 0

    jax.lax.fori_loop(0, frames_per_block, fill_frame, 0)
    frames = frames_scratch[:]
    real = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = real * real + imag * imag  # (FB, n_freq)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    logmel = multiplier * (
        jnp.log(jnp.maximum(mel, amin)) / math.log(10.0)
    ) - db_offset
    out_ref[0, :, :] = logmel


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "frames_per_block", "top_db", "multiplier",
        "amin", "ref_value", "interpret",
    ),
)
def fused_fbank(
    wav,
    window,
    fbank_matrix,
    n_fft=400,
    hop_length=160,
    top_db=80.0,
    multiplier=10.0,
    amin=1e-10,
    ref_value=1.0,
    frames_per_block=128,
    interpret=False,
):
    """Log-mel filterbanks (B, n_frames, n_mels) from (B, T) waveforms.

    Numerically matches lobes.features.Fbank's unfused path (centered
    framing, hamming window folded into the DFT, power spectrum, HTK mel,
    10*log10 with amin + per-sequence top_db clamp).
    """
    B, T = wav.shape
    n_freq = n_fft // 2 + 1
    n_mels = fbank_matrix.shape[1]
    # center padding (same as STFT(center=True))
    wav = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)))
    n_frames = 1 + (wav.shape[1] - n_fft) // hop_length
    n_blocks = -(-n_frames // frames_per_block)
    # pad so blocks are full and the last frame's window is in range
    needed = (n_blocks * frames_per_block - 1) * hop_length + n_fft
    if wav.shape[1] < needed:
        wav = jnp.pad(wav, ((0, 0), (0, needed - wav.shape[1])))

    # fold the window into the DFT matrices (one matmul = window + DFT)
    k = np.arange(n_freq)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    w = jnp.asarray(window, dtype=jnp.float32)[:, None]
    cos_m = jnp.asarray(np.cos(ang), jnp.float32) * w
    sin_m = jnp.asarray(-np.sin(ang), jnp.float32) * w

    kernel = functools.partial(
        _mel_kernel,
        frames_per_block=frames_per_block,
        n_fft=n_fft,
        hop=hop_length,
        n_freq=n_freq,
        n_mels=n_mels,
        amin=amin,
        multiplier=multiplier,
        db_offset=multiplier * math.log10(max(amin, ref_value)),
    )
    block_wav = (frames_per_block - 1) * hop_length + n_fft
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks * frames_per_block, n_mels), jnp.float32
        ),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # wav stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frames_per_block, n_mels), lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((frames_per_block, n_fft), jnp.float32),
            pltpu.VMEM((block_wav,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wav, cos_m, sin_m, jnp.asarray(fbank_matrix))
    out = out[:, :n_frames, :]
    # per-sequence top_db clamp (global max -> outside the kernel)
    maxes = jnp.max(out, axis=(1, 2), keepdims=True)
    return jnp.maximum(out, maxes - top_db)
