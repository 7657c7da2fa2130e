"""Speech-to-reverberation modulation energy ratio (SRMR), simplified.

Non-intrusive quality metric used as the MetricGAN-U discriminator
target (the reference imports the external SRMRpy package in
recipes/Voicebank/enhance/MetricGAN-U/train.py; this is a from-scratch
simplification: mel bands instead of a gammatone filterbank, envelope
modulation energies split at 20 Hz). Higher = cleaner/less reverberant.
Host-side numpy: gradient-free scoring, like the reference's usage.
"""

import numpy as np


def _envelope(x, frame=256, hop=64):
    """Per-frame RMS envelope of a 1-D signal."""
    n = 1 + max(0, (len(x) - frame)) // hop
    frames = np.lib.stride_tricks.as_strided(
        x, (n, frame), (x.strides[0] * hop, x.strides[0])
    )
    return np.sqrt(np.mean(frames**2, axis=1) + 1e-12)


def srmr_ratio(wav, sample_rate=16000, n_bands=8):
    """SRMR-like ratio for one waveform (1-D array) -> float.

    The signal is split into ``n_bands`` mel-spaced frequency bands
    (FFT-domain triangles), each band's temporal envelope is modulation-
    analyzed, and the energy in 4-20 Hz modulations (speech syllabic
    rates) is divided by the 20-128 Hz energy (reverberant tails and
    noise flatten the modulation spectrum, lowering the ratio).
    """
    from speechbrain_tpu.processing.features import mel_filterbank_matrix

    wav = np.asarray(wav, np.float64)
    n_fft = 512
    hop = 128
    n = 1 + max(0, (len(wav) - n_fft)) // hop
    if n < 8:
        return 0.0
    frames = np.lib.stride_tricks.as_strided(
        wav, (n, n_fft), (wav.strides[0] * hop, wav.strides[0])
    )
    spec = np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=1)) ** 2
    mel = np.asarray(
        mel_filterbank_matrix(n_bands, n_fft, sample_rate, 0,
                              sample_rate // 2)
    )
    band_env = spec @ mel  # (T, n_bands) band envelopes
    env_rate = sample_rate / hop
    mod = np.abs(np.fft.rfft(
        band_env - band_env.mean(0, keepdims=True), axis=0
    )) ** 2
    freqs = np.fft.rfftfreq(band_env.shape[0], d=1.0 / env_rate)
    low = mod[(freqs >= 4) & (freqs < 20)].sum()
    high = mod[(freqs >= 20) & (freqs < 128)].sum()
    return float(low / (high + 1e-10))


def srmr_batch(wavs, lens=None, sample_rate=16000):
    """Batched SRMR scores: (B, T) [+ relative lens] -> (B,) float32."""
    wavs = np.asarray(wavs)
    out = np.zeros(wavs.shape[0], np.float32)
    for i, w in enumerate(wavs):
        L = (
            int(np.asarray(lens)[i] * wavs.shape[1])
            if lens is not None else wavs.shape[1]
        )
        out[i] = srmr_ratio(w[:L], sample_rate)
    return out


def srmr_batch_normalized(wavs, lens=None, sample_rate=16000, scale=100.0):
    """SRMR squashed to [0, 1) with tanh(srmr / scale) — the normalized
    non-intrusive target shape MetricGAN-U's discriminator regresses
    (any (wavs, lens) -> [0, 1] scorer is pluggable there, e.g. DNSMOS)."""
    return np.tanh(srmr_batch(wavs, lens, sample_rate) / scale)
