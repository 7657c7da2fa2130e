"""Fused Pallas mel-frontend kernel.

Replaces the reference's STFT -> |.|^2 -> mel -> dB chain
(``speechbrain/processing/features.py:58-760``) with ONE kernel per
(batch row, frame block): the waveform block is pipelined into VMEM,
framed in-register, transformed by a window-folded real DFT (two MXU
matmuls), squared, mel-projected (third matmul) and log-compressed —
no frames / power-spectrum intermediates ever hit HBM.

TPU alignment notes: all matmul dims are padded to lane multiples
(n_fft->512, n_freq->256, n_mels->128-multiple); the overlap between
adjacent frame blocks is delivered as a second, tail input block so no
manual (unaligned) DMA is needed — Pallas double-buffers both inputs.

Unaligned hops (e.g. the standard 160) are handled by phase-grouped
framing: frame starts i*hop fall into lcm(hop,128)/hop classes by their
offset mod 128; one ``pltpu.roll`` per class realigns the buffer so
every VMEM frame load is 128-aligned (Mosaic rejects unaligned vector
loads). 4 rolls per block for hop=160 — cheap VPU work next to the
three MXU matmuls.

MEASURED (v5e, 64x10s fp32, hop=160): fused kernel 165k audio-s/s vs
247k for the unfused window-folded matmul-DFT that XLA fuses itself —
the roll+copy framing costs more than it saves at this arithmetic
intensity, so ``Fbank(fused=False)`` stays the default; the kernel is
kept for aligned-hop configs and as the base for deeper fusions.

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


def _lcm(a, b):
    return a * b // math.gcd(a, b)


def _mel_kernel(
    x_ref, tail_ref, cos_ref, sin_ref, mel_ref, out_ref, frames_scratch,
    wav_scratch, roll_scratch,
    *, frames_per_block, n_fft_pad, hop, amin, multiplier, db_offset,
):
    # x_ref: (1, 1, FB*hop); tail_ref: (1, 1, n_fft_pad) — next block's head
    block_main = x_ref.shape[-1]
    wav_scratch[0, :block_main] = x_ref[0, 0]
    wav_scratch[0, block_main:] = tail_ref[0, 0]

    # Frame starts i*hop are not lane-aligned for arbitrary hop. Group
    # frames by start offset mod 128: within phase class s the starts are
    # s*hop + q*lcm(hop,128), so rolling the buffer left by (s*hop % 128)
    # lanes makes every class-s load 128-aligned — `period` rolls total
    # (4 for the standard hop of 160) instead of per-frame unaligned DMA.
    # The rolled buffer is staged through a scratch ref because Mosaic
    # only lowers dynamic slices on refs, with pl.multiple_of alignment.
    period = _lcm(hop, 128) // hop
    stride = period * hop  # multiple of 128
    groups = frames_per_block // period
    L = block_main + n_fft_pad
    for s in range(period):
        shift = (s * hop) % 128
        base = s * hop - shift  # multiple of 128
        src = wav_scratch
        if shift:
            # left-roll by `shift` == forward roll by L - shift (roll
            # requires a non-negative shift)
            roll_scratch[:] = pltpu.roll(
                wav_scratch[:], shift=L - shift, axis=1
            )
            src = roll_scratch

        def fill_frame(q, _, src=src, s=s, base=base):
            off = pl.multiple_of(q * stride + base, 128)
            frames_scratch[pl.ds(s + q * period, 1), :] = (
                src[:, pl.ds(off, n_fft_pad)]
            )
            return 0

        jax.lax.fori_loop(0, groups, fill_frame, 0)
    frames = frames_scratch[:]
    real = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = real * real + imag * imag  # (FB, n_freq_pad)
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
    # lane-aligned padded dims (last dim multiples of 128 for TPU tiling)
    n_fft_pad = -(-n_fft // 128) * 128
    n_freq_pad = -(-n_freq // 128) * 128
    n_mels_pad = -(-n_mels // 128) * 128
    # frames-per-block must make the block wav length a multiple of the
    # tail block size so the tail's BlockSpec indexing lines up, and a
    # multiple of the alignment period so phase classes tile evenly
    period = _lcm(hop_length, 128) // hop_length
    while (
        (frames_per_block * hop_length) % n_fft_pad != 0
        or frames_per_block % period != 0
    ):
        frames_per_block += 1
    block_main = frames_per_block * hop_length
    tail_ratio = block_main // n_fft_pad

    # center padding (same as STFT(center=True))
    wav = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)))
    n_frames = 1 + (wav.shape[1] - n_fft) // hop_length
    n_blocks = -(-n_frames // frames_per_block)
    needed = n_blocks * block_main + n_fft_pad
    if wav.shape[1] < needed:
        wav = jnp.pad(wav, ((0, 0), (0, needed - wav.shape[1])))
    wav = wav[:, :needed]

    # fold the window into the DFT matrices (one matmul = window + DFT);
    # zero-pad rows to n_fft_pad and freq cols to n_freq_pad
    k = np.arange(n_freq)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    w = jnp.asarray(window, dtype=jnp.float32)[:, None]
    cos_m = jnp.asarray(np.cos(ang), jnp.float32) * w
    sin_m = jnp.asarray(-np.sin(ang), jnp.float32) * w
    cos_m = jnp.pad(cos_m, ((0, n_fft_pad - n_fft), (0, n_freq_pad - n_freq)))
    sin_m = jnp.pad(sin_m, ((0, n_fft_pad - n_fft), (0, n_freq_pad - n_freq)))
    mel_m = jnp.pad(
        jnp.asarray(fbank_matrix, jnp.float32),
        ((0, n_freq_pad - n_freq), (0, n_mels_pad - n_mels)),
    )

    kernel = functools.partial(
        _mel_kernel,
        frames_per_block=frames_per_block,
        n_fft_pad=n_fft_pad,
        hop=hop_length,
        amin=amin,
        multiplier=multiplier,
        db_offset=multiplier * math.log10(max(amin, ref_value)),
    )
    # flatten (batch, block) into one grid axis; the second-to-last dim of
    # every operand block then equals the full array dim (TPU tiling rule)
    wav_main = wav[:, : n_blocks * block_main].reshape(
        B * n_blocks, 1, block_main
    )
    tail_idx = (
        (np.arange(n_blocks)[:, None] + 1) * block_main
        + np.arange(n_fft_pad)[None, :]
    )
    wav_tail = wav[:, tail_idx].reshape(B * n_blocks, 1, n_fft_pad)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B * n_blocks, frames_per_block, n_mels_pad), jnp.float32
        ),
        grid=(B * n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, block_main), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_fft_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frames_per_block, n_mels_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((frames_per_block, n_fft_pad), jnp.float32),
            pltpu.VMEM((1, block_main + n_fft_pad), jnp.float32),
            pltpu.VMEM((1, block_main + n_fft_pad), jnp.float32),
        ],
        interpret=interpret,
    )(wav_main, wav_tail, cos_m, sin_m, mel_m)
    out = out.reshape(B, n_blocks * frames_per_block, n_mels_pad)
    out = out[:, :n_frames, :n_mels]
    # per-sequence top_db clamp (global max -> outside the kernel)
    maxes = jnp.max(out, axis=(1, 2), keepdims=True)
    return jnp.maximum(out, maxes - top_db)
