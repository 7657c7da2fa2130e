"""Low-level signal ops: amplitude, normalization, convolution, reverb,
overlap-add, notch filters.

Capability parity with the reference's
``speechbrain/processing/signal_processing.py`` (compute_amplitude :17,
normalize :100, rescale :160, convolve1d :195, reverberate :310,
dB_to_amplitude, notch_filter :407, overlap_and_add :470). All functions
are jit-safe jnp; FFT convolution rides XLA's batched FFT on TPU.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def compute_amplitude(waveforms, lengths=None, amp_type="avg", scale="linear"):
    """Average or peak amplitude (optionally masked by absolute lengths).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> sig = jnp.sin(jnp.arange(16000.0))
    >>> bool((compute_amplitude(sig, sig.shape[0]) < 1.0).all())
    True
    """
    if amp_type not in ("avg", "peak"):
        raise ValueError("amp_type must be 'avg' or 'peak'")
    if scale not in ("linear", "dB"):
        raise ValueError("scale must be 'linear' or 'dB'")
    squeeze = waveforms.ndim == 1
    if squeeze:
        waveforms = waveforms[None]
    if amp_type == "avg":
        if lengths is None:
            out = jnp.mean(jnp.abs(waveforms), axis=1, keepdims=True)
        else:
            wav_sum = jnp.sum(jnp.abs(waveforms), axis=1, keepdims=True)
            out = wav_sum / lengths
    else:
        out = jnp.max(jnp.abs(waveforms), axis=1, keepdims=True)
    if scale == "dB":
        out = jnp.maximum(20 * jnp.log10(out + 1e-14), -80.0)
    return out[0] if squeeze else out


def normalize(waveforms, lengths=None, amp_type="avg", eps=1e-14):
    """Normalize amplitude to 1 (avg or peak)."""
    den = compute_amplitude(waveforms, lengths, amp_type) + eps
    return waveforms / den


def rescale(waveforms, lengths, target_lvl, amp_type="avg", scale="linear"):
    """Rescale to a target level (linear gain or dB)."""
    out = normalize(waveforms, lengths, amp_type)
    if scale == "linear":
        return target_lvl * out
    if scale == "dB":
        return dB_to_amplitude(target_lvl) * out
    raise ValueError("scale must be 'linear' or 'dB'")


def dB_to_amplitude(SNR):
    """10^(dB/20).

    Example
    -------
    >>> dB_to_amplitude(0)
    1.0
    """
    return 10 ** (SNR / 20)


def convolve1d(
    waveform,
    kernel,
    padding=0,
    pad_type="constant",
    stride=1,
    groups=1,
    use_fft=False,
    rotation_index=0,
):
    """1-D (cross-)convolution on (batch, time, channels) data.

    With ``use_fft=True`` performs circular FFT convolution with a kernel
    rotation (the reference's reverberation path) — on TPU this is the
    fast path for long kernels (RIRs).
    """
    if isinstance(padding, (list, tuple)):
        waveform = jnp.pad(
            waveform,
            ((0, 0), tuple(padding), (0, 0)),
            mode={"constant": "constant", "reflect": "reflect", "replicate": "edge"}[
                pad_type
            ],
        )
        padding = 0
    if use_fft:
        # align kernel/waveform lengths, rotate kernel for causality control
        T = waveform.shape[1]
        K = kernel.shape[1]
        if K > T:
            kernel = kernel[:, :T, :]
            K = T
        zero_length = T - K
        zeros = jnp.zeros((kernel.shape[0], zero_length, kernel.shape[2]), kernel.dtype)
        # [kernel[rot:] | zeros | kernel[:rot]] == roll(pad(kernel), -rot):
        # jnp.roll accepts a TRACED rotation index (jit-safe)
        kernel = jnp.roll(
            jnp.concatenate([kernel, zeros], axis=1), -rotation_index, axis=1
        )
        f_sig = jnp.fft.rfft(waveform, axis=1)
        f_ker = jnp.fft.rfft(kernel, axis=1)
        return jnp.fft.irfft(f_sig * f_ker, n=waveform.shape[1], axis=1)
    # direct conv via lax (NWC layout)
    dn = jax.lax.conv_dimension_numbers(
        waveform.shape, kernel.shape, ("NWC", "WIO", "NWC")
    )
    # kernel comes in (batch-or-1, width, channels); map to (W, I, O)
    k = jnp.moveaxis(kernel, 0, -1)  # (width, channels, out)
    out = jax.lax.conv_general_dilated(
        waveform,
        k,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    return out


def reverberate(waveforms, rir_waveform, rescale_amp="avg"):
    """Convolve a batch with a room impulse response, preserving amplitude
    (reference signal_processing.py:310)."""
    orig_shape = waveforms.shape
    if waveforms.ndim == 1:
        waveforms = waveforms[None, :, None]
    elif waveforms.ndim == 2:
        waveforms = waveforms[..., None]
    if rir_waveform.ndim == 1:
        rir_waveform = rir_waveform[None, :, None]
    elif rir_waveform.ndim == 2:
        rir_waveform = rir_waveform[..., None]
    orig_amplitude = compute_amplitude(
        waveforms[..., 0], waveforms.shape[1], rescale_amp
    )
    # use direct-path delay as the rotation index so speech stays aligned
    direct_index = jnp.argmax(jnp.abs(rir_waveform), axis=1).max()
    waveforms = convolve1d(
        waveforms, rir_waveform, use_fft=True, rotation_index=direct_index
    )
    rev_amplitude = compute_amplitude(waveforms[..., 0], waveforms.shape[1], rescale_amp)
    waveforms = waveforms * (orig_amplitude / (rev_amplitude + 1e-14))[..., None]
    if len(orig_shape) == 1:
        return waveforms[0, :, 0]
    if len(orig_shape) == 2:
        return waveforms[..., 0]
    return waveforms


def notch_filter(notch_freq, filter_width=101, notch_width=0.05):
    """FIR notch filter kernel (1, width, 1) for DropFreq augmentation
    (reference signal_processing.py:407)."""
    pad = filter_width // 2
    inputs = np.arange(filter_width) - pad
    notch_freq += notch_width

    def sinc(x):
        def _sinc(x):
            return np.sin(x) / x

        # the zero is at the middle index
        return np.concatenate([_sinc(x[:pad]), np.ones(1), _sinc(x[pad + 1 :])])

    hlpf = sinc(3 * (notch_freq - notch_width) * inputs)
    hlpf *= np.blackman(filter_width)
    hlpf /= np.sum(hlpf)
    hhpf = sinc(3 * (notch_freq + notch_width) * inputs)
    hhpf *= np.blackman(filter_width)
    hhpf /= -np.sum(hhpf)
    hhpf[pad] += 1
    return jnp.asarray((hlpf + hhpf).astype(np.float32)).reshape(1, -1, 1)


def overlap_and_add(signal, frame_step):
    """Reconstruct from framed signal (..., frames, frame_length)
    (reference signal_processing.py:470)."""
    frames, frame_length = signal.shape[-2:]
    out_len = (frames - 1) * frame_step + frame_length
    idx = (
        np.arange(frames)[:, None] * frame_step + np.arange(frame_length)[None, :]
    ).reshape(-1)
    out = jnp.zeros(signal.shape[:-2] + (out_len,), signal.dtype)
    return out.at[..., idx].add(signal.reshape(signal.shape[:-2] + (-1,)))


def resynthesize(enhanced_mag, noisy_inputs, stft, istft, normalize_wavs=True):
    """Resynthesize waveform from enhanced magnitude + noisy phase
    (reference signal_processing.py:530)."""
    noisy_spec = stft(noisy_inputs)
    phase = jnp.angle(noisy_spec)
    complex_predictions = enhanced_mag * jnp.exp(1j * phase)
    pred_wavs = istft(complex_predictions, sig_length=noisy_inputs.shape[1])
    if normalize_wavs:
        abs_max = jnp.max(jnp.abs(pred_wavs), axis=1, keepdims=True)
        pred_wavs = pred_wavs / jnp.maximum(abs_max, 1.0)
    return pred_wavs


def gabor_impulse_response(t, center, fwhm):
    """Gabor filter impulse responses (for the LEAF frontend)."""
    denominator = 1.0 / (jnp.sqrt(2.0 * math.pi) * fwhm)
    gaussian = jnp.exp(jnp.tensordot(1.0 / (2.0 * fwhm**2), -(t**2), axes=0))
    center_frequency_complex = center.astype(jnp.complex64)
    t_complex = t.astype(jnp.complex64)
    sinusoid = jnp.exp(
        1j * jnp.tensordot(center_frequency_complex, t_complex, axes=0)
    )
    denominator = denominator.astype(jnp.complex64)[:, None]
    gaussian = gaussian.astype(jnp.complex64)
    return denominator * sinusoid * gaussian
