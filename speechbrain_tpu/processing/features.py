"""Feature extraction: STFT, filterbanks, DCT, deltas, normalization.

Capability parity with the reference's ``speechbrain/processing/features.py``
(STFT :58, ISTFT :202, spectral_magnitude :341, Filterbank :381, DCT :762,
Deltas :838, ContextWindow :910, InputNormalization :1265, GlobalNorm :1618),
designed for XLA/TPU:

* every transform is a pure jit-safe function of its inputs; the classes are
  thin config holders (precomputed constant matrices) with ``__call__``;
* framing is a static gather, the FFT is ``jnp.fft.rfft``, and the mel
  projection is a single matmul that XLA fuses with the surrounding
  elementwise ops — the hot composite additionally has a fused Pallas
  kernel in ``speechbrain_tpu.ops.mel_frontend``;
* layouts follow the toolkit convention ``(batch, time, freq[, channel])``
  and the reference's exact numerical definitions (hamming window,
  HTK mel scale 2595*log10(1+f/700), top_db clamp per sequence).

Doctest shapes mirror the reference's:

>>> import jax.numpy as jnp
>>> x = jnp.zeros((10, 16000))
>>> STFT(sample_rate=16000, win_length=25, hop_length=10, n_fft=400)(x).shape
(10, 101, 201)
>>> Fbank = None  # Fbank lives in speechbrain_tpu.lobes.features
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    mark_as_transfer,
    register_checkpoint_hooks,
)


def _ms_to_samples(sample_rate, ms):
    return int(round(sample_rate / 1000.0 * ms))


def hamming_window(n, dtype=np.float32):
    """Periodic hamming window matching torch.hamming_window defaults."""
    k = np.arange(n)
    return (0.54 - 0.46 * np.cos(2 * np.pi * k / n)).astype(dtype)


def hann_window(n, dtype=np.float32):
    """Periodic Hann window of given length."""
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2 * np.pi * k / n)).astype(dtype)


def blackman_window(n, dtype=np.float32):
    """Periodic Blackman window of given length."""
    k = np.arange(n)
    w = (
        0.42
        - 0.5 * np.cos(2 * np.pi * k / n)
        + 0.08 * np.cos(4 * np.pi * k / n)
    )
    return w.astype(dtype)


_WINDOWS = {
    "hamming": hamming_window,
    "hann": hann_window,
    "blackman": blackman_window,
}


def frame_signal(x, frame_length, hop_length, center=True, pad_mode="constant"):
    """Slice a signal (..., time) into frames (..., n_frames, frame_length).

    Static-shape gather: jit-safe, and XLA turns it into an efficient
    strided load on TPU.
    """
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(frame_length // 2, frame_length // 2)]
        mode = {"constant": "constant", "reflect": "reflect", "replicate": "edge"}[
            pad_mode
        ]
        x = jnp.pad(x, pad, mode=mode)
    n_frames = 1 + (x.shape[-1] - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )
    return x[..., idx]


class STFT:
    """Short-Term Fourier Transform; returns complex (batch, time, freq)
    (multi-channel: (batch, time, freq, channel), as in the reference).

    Arguments mirror the reference's STFT (processing/features.py:58):
    win/hop are in milliseconds and derived from ``sample_rate``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> stft = STFT(sample_rate=16000)
    >>> stft(jnp.zeros((2, 16000))).shape
    (2, 101, 201)
    """

    def __init__(
        self,
        sample_rate,
        win_length=25,
        hop_length=10,
        n_fft=400,
        window_fn="hamming",
        normalized_stft=False,
        center=True,
        pad_mode="constant",
        onesided=True,
        backend="auto",
    ):
        self.sample_rate = sample_rate
        self.win_length = _ms_to_samples(sample_rate, win_length)
        self.hop_length = _ms_to_samples(sample_rate, hop_length)
        self.n_fft = n_fft
        self.normalized_stft = normalized_stft
        self.center = center
        self.pad_mode = pad_mode
        self.onesided = onesided
        self.backend = backend
        window = (
            _WINDOWS[window_fn](self.win_length)
            if isinstance(window_fn, str)
            else np.asarray(window_fn(self.win_length), dtype=np.float32)
        )
        if self.win_length < n_fft:
            # center the window inside the fft size (torch.stft behaviour)
            left = (n_fft - self.win_length) // 2
            padded = np.zeros(n_fft, dtype=np.float32)
            padded[left : left + self.win_length] = window
            window = padded
        self.window = jnp.asarray(window)
        self._dft_mats = None  # lazily built (cos, sin) for the matmul path

    def _resolve_backend(self):
        if self.backend != "auto":
            return self.backend
        import jax as _jax

        # TPU: FFT custom-calls may be unavailable (axon) and the MXU makes
        # a real-DFT matmul the faster path anyway at speech n_fft sizes.
        return "matmul" if _jax.default_backend() == "tpu" else "rfft"

    def _get_dft_mats(self):
        if self._dft_mats is None:
            n_freq = self.n_fft // 2 + 1
            k = np.arange(n_freq)[None, :]
            n = np.arange(self.n_fft)[:, None]
            ang = 2.0 * np.pi * n * k / self.n_fft
            w = np.asarray(self.window)[:, None]
            # fold the window into the DFT matrices: one matmul does
            # window + transform together (MXU-friendly)
            cos_m = (np.cos(ang) * w).astype(np.float32)
            sin_m = (-np.sin(ang) * w).astype(np.float32)
            self._dft_mats = (jnp.asarray(cos_m), jnp.asarray(sin_m))
        return self._dft_mats

    def _frames(self, x):
        return frame_signal(x, self.n_fft, self.hop_length, self.center, self.pad_mode)

    def __call__(self, x):
        multi_channel = x.ndim == 3
        if multi_channel:
            x = jnp.moveaxis(x, 2, 1)  # (batch, channel, time)
        frames = self._frames(x)
        if self._resolve_backend() == "matmul":
            cos_m, sin_m = self._get_dft_mats()
            real = jnp.matmul(frames, cos_m)
            imag = jnp.matmul(frames, sin_m)
            stft = jax.lax.complex(real, imag)
        else:
            frames = frames * self.window
            if self.onesided:
                stft = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
            else:
                stft = jnp.fft.fft(frames, n=self.n_fft, axis=-1)
        if self.normalized_stft:
            stft = stft / math.sqrt(self.n_fft)
        if multi_channel:
            stft = jnp.moveaxis(stft, 1, -1)  # (batch, time, freq, channel)
        return stft

    def power(self, x):
        """Power spectrogram |STFT|^2 without materializing complex values —
        the TPU fast path (two real matmuls with the window folded in)."""
        multi_channel = x.ndim == 3
        if multi_channel:
            x = jnp.moveaxis(x, 2, 1)
        frames = self._frames(x)
        if self._resolve_backend() == "matmul":
            cos_m, sin_m = self._get_dft_mats()
            real = jnp.matmul(frames, cos_m)
            imag = jnp.matmul(frames, sin_m)
            ps = real * real + imag * imag
        else:
            frames = frames * self.window
            stft = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
            ps = stft.real**2 + stft.imag**2
        if self.normalized_stft:
            ps = ps / self.n_fft
        if multi_channel:
            ps = jnp.moveaxis(ps, 1, -1)
        return ps

    def get_filter_properties(self):
        from speechbrain_tpu.utils.filter_analysis import FilterProperties

        if not self.center:
            raise ValueError("Filter properties assume a centered STFT")
        return FilterProperties(window_size=self.win_length, stride=self.hop_length)

    def inverse(self):
        """A matched ISTFT. Use this rather than constructing ISTFT from
        STFT attributes: the constructor takes win/hop in MILLISECONDS
        while the attributes store SAMPLES."""
        sr = self.sample_rate
        return ISTFT(
            sample_rate=sr,
            n_fft=self.n_fft,
            win_length=self.win_length * 1000.0 / sr,
            hop_length=self.hop_length * 1000.0 / sr,
        )


class ISTFT:
    """Inverse STFT via windowed overlap-add with window-envelope
    normalization (reference processing/features.py:202).

    Example
    -------
    >>> import jax.numpy as jnp, numpy as np
    >>> x = jnp.asarray(np.random.randn(1, 16000).astype("float32"))
    >>> stft = STFT(16000, window_fn="hann")
    >>> istft = ISTFT(16000, window_fn="hann")
    >>> rec = istft(stft(x), sig_length=16000)
    >>> bool(jnp.max(jnp.abs(rec - x)) < 1e-2)  # bf16_3x matmuls on TPU
    True
    """

    def __init__(
        self,
        sample_rate,
        n_fft=400,
        win_length=25,
        hop_length=10,
        window_fn="hamming",
        normalized_stft=False,
        center=True,
        epsilon=1e-12,
    ):
        self.sample_rate = sample_rate
        self.win_length = _ms_to_samples(sample_rate, win_length)
        self.hop_length = _ms_to_samples(sample_rate, hop_length)
        self.n_fft = n_fft
        self.center = center
        self.epsilon = epsilon
        self.normalized_stft = normalized_stft
        window = (
            _WINDOWS[window_fn](self.win_length)
            if isinstance(window_fn, str)
            else np.asarray(window_fn(self.win_length), dtype=np.float32)
        )
        self.window = jnp.asarray(window)

    def __call__(self, stft, sig_length=None):
        multi_channel = stft.ndim == 4
        if multi_channel:
            stft = jnp.moveaxis(stft, -1, 1)
        if self.normalized_stft:
            stft = stft * math.sqrt(self.n_fft)
        frames = jnp.fft.irfft(stft, n=self.n_fft, axis=-1)
        frames = frames[..., : self.win_length] * self.window
        n_frames = frames.shape[-2]
        out_len = self.n_fft + self.hop_length * (n_frames - 1)
        pos = np.arange(n_frames) * self.hop_length
        idx = pos[:, None] + np.arange(self.win_length)[None, :]
        flat_idx = idx.reshape(-1)
        batch_shape = frames.shape[:-2]
        sig = jnp.zeros(batch_shape + (out_len,), frames.dtype)
        sig = sig.at[..., flat_idx].add(
            frames.reshape(batch_shape + (-1,))
        )
        # window envelope for normalization
        env = jnp.zeros(out_len, frames.dtype)
        env = env.at[flat_idx].add(jnp.tile(self.window**2, n_frames))
        sig = sig / jnp.maximum(env, self.epsilon)
        if self.center:
            sig = sig[..., self.n_fft // 2 :]
        if sig_length is not None:
            sig = sig[..., :sig_length]
        if multi_channel:
            sig = jnp.moveaxis(sig, 1, -1)
        return sig


def spectral_magnitude(stft, power=1, log=False, eps=1e-14):
    """Magnitude of a complex (or trailing-[re,im]) spectrogram.

    power=1 gives the power spectrogram (|X|^2), power=0.5 the magnitude —
    the reference's convention (processing/features.py:341).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> round(float(
    ...     spectral_magnitude(jnp.array([[3.0 + 4.0j]]), power=0.5)[0, 0]
    ... ), 4)
    5.0
    """
    if jnp.iscomplexobj(stft):
        spectr = stft.real**2 + stft.imag**2
    else:
        spectr = jnp.sum(stft**2, axis=-1)
    if power < 1:
        spectr = spectr + eps
    spectr = spectr**power
    if log:
        return jnp.log(spectr + eps)
    return spectr


def _to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank_matrix(
    n_mels=40,
    n_fft=400,
    sample_rate=16000,
    f_min=0.0,
    f_max=8000.0,
    filter_shape="triangular",
    dtype=np.float32,
):
    """(n_freqs, n_mels) filter matrix with the reference's filter shapes."""
    n_stft = n_fft // 2 + 1
    mel = np.linspace(_to_mel(f_min), _to_mel(f_max), n_mels + 2)
    hz = _to_hz(mel)
    band = hz[1:] - hz[:-1]
    band = band[:-1][:, None]  # (n_mels, 1)
    f_central = hz[1:-1][:, None]
    all_freqs = np.linspace(0, sample_rate // 2, n_stft)[None, :]  # (1, n_freqs)
    if filter_shape == "triangular":
        slope = (all_freqs - f_central) / band
        fbank = np.maximum(0.0, np.minimum(slope + 1.0, -slope + 1.0))
    elif filter_shape == "rectangular":
        low = f_central - band
        high = f_central + band
        fbank = ((all_freqs >= low) & (all_freqs <= high)).astype(np.float64)
    elif filter_shape == "gaussian":
        fbank = np.exp(-0.5 * ((all_freqs - f_central) / (band / 2.0)) ** 2)
    else:
        raise ValueError(f"Unknown filter shape {filter_shape}")
    return fbank.T.astype(dtype)  # (n_freqs, n_mels)


class Filterbank:
    """Mel filterbank projection with optional dB compression.

    Matches the reference Filterbank (processing/features.py:381):
    multiplier 10 for power spectrograms, amin clamp, per-sequence top_db.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> fb = Filterbank()
    >>> fb(jnp.ones((10, 101, 201))).shape
    (10, 101, 40)
    """

    def __init__(
        self,
        n_mels=40,
        log_mel=True,
        filter_shape="triangular",
        f_min=0.0,
        f_max=8000.0,
        n_fft=400,
        sample_rate=16000,
        power_spectrogram=2,
        amin=1e-10,
        ref_value=1.0,
        top_db=80.0,
        param_change_factor=1.0,
        param_rand_factor=0.0,
        freeze=True,
    ):
        self.n_mels = n_mels
        self.log_mel = log_mel
        self.amin = amin
        self.top_db = top_db
        self.multiplier = 10.0 if power_spectrogram == 2 else 20.0
        self.db_multiplier = math.log10(max(amin, ref_value))
        self.fbank_matrix = jnp.asarray(
            mel_filterbank_matrix(
                n_mels, n_fft, sample_rate, f_min, f_max, filter_shape
            )
        )

    def __call__(self, spectrogram):
        multi_channel = spectrogram.ndim == 4
        if multi_channel:
            spectrogram = jnp.moveaxis(spectrogram, 3, 1)
        fbanks = jnp.matmul(spectrogram, self.fbank_matrix)
        if self.log_mel:
            fbanks = self._amplitude_to_db(fbanks)
        if multi_channel:
            fbanks = jnp.moveaxis(fbanks, 1, 3)
        return fbanks

    def _amplitude_to_db(self, x):
        x_db = self.multiplier * jnp.log10(jnp.maximum(x, self.amin))
        x_db = x_db - self.multiplier * self.db_multiplier
        # per-sequence max over (time, mel), clamp to max - top_db
        maxes = jnp.max(x_db, axis=(-2, -1), keepdims=True)
        return jnp.maximum(x_db, maxes - self.top_db)


class DCT:
    """Type-II DCT with ortho norm, as used for MFCCs
    (reference processing/features.py:762).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> dct = DCT(input_size=40, n_out=20)
    >>> dct(jnp.ones((10, 101, 40))).shape
    (10, 101, 20)
    """

    def __init__(self, input_size, n_out=20, ortho_norm=True):
        if n_out > input_size:
            raise ValueError("n_out cannot exceed input size")
        n = np.arange(float(input_size))
        k = np.arange(float(n_out))
        dct = np.cos(np.pi / input_size * (n[None, :] + 0.5) * k[:, None]) * 2.0
        if ortho_norm:
            dct[0] *= 1.0 / math.sqrt(2.0)
            dct *= math.sqrt(1.0 / (2.0 * input_size))
        self.dct_mat = jnp.asarray(dct.T.astype(np.float32))  # (in, out)

    def __call__(self, x):
        multi_channel = x.ndim == 4
        if multi_channel:
            x = jnp.moveaxis(x, 3, 1)
        out = jnp.matmul(x, self.dct_mat)
        if multi_channel:
            out = jnp.moveaxis(out, 1, 3)
        return out


class Deltas:
    """Delta (time-derivative) coefficients with the standard regression
    window (reference processing/features.py:838).

    Implemented as a 5-tap weighted sum of shifted feature maps — XLA fuses
    the shifts+adds into one elementwise kernel (no conv needed).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> deltas = Deltas(input_size=20)
    >>> deltas(jnp.ones((10, 101, 20))).shape
    (10, 101, 20)
    """

    def __init__(self, input_size=None, window_length=5):
        self.n = (window_length - 1) // 2
        self.denom = self.n * (self.n + 1) * (2 * self.n + 1) / 3.0

    def __call__(self, x):
        # x: (batch, time, feat[, channel]); pad time with edge values
        pad = [(0, 0)] * x.ndim
        pad[1] = (self.n, self.n)
        xp = jnp.pad(x, pad, mode="edge")
        T = x.shape[1]
        out = jnp.zeros_like(x)
        for k in range(-self.n, self.n + 1):
            if k == 0:
                continue
            out = out + k * jax.lax.slice_in_dim(xp, k + self.n, k + self.n + T, axis=1)
        return out / self.denom


class ContextWindow:
    """Concatenate each frame with its left/right neighbours along the
    feature axis (reference processing/features.py:910).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> cw = ContextWindow(left_frames=2, right_frames=2)
    >>> cw(jnp.ones((10, 101, 20))).shape
    (10, 101, 100)
    """

    def __init__(self, left_frames=0, right_frames=0):
        self.left_frames = left_frames
        self.right_frames = right_frames

    def __call__(self, x):
        pad = [(0, 0)] * x.ndim
        pad[1] = (self.left_frames, self.right_frames)
        xp = jnp.pad(x, pad, mode="constant")
        T = x.shape[1]
        pieces = [
            jax.lax.slice_in_dim(xp, k, k + T, axis=1)
            for k in range(self.left_frames + self.right_frames + 1)
        ]
        return jnp.concatenate(pieces, axis=2)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

@register_checkpoint_hooks
class InputNormalization:
    """Mean/variance normalization at sentence, batch, speaker or global
    level with running statistics (reference processing/features.py:1265).

    The per-batch math is pure and jit-safe (masked statistics); the
    running global statistics are updated host-side from the returned
    values, so calls from an eager loop accumulate state while calls
    under jit can use ``normalize(x, lengths, mean, std)`` directly.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> norm = InputNormalization(norm_type="sentence")
    >>> feats = norm(jnp.ones((2, 10, 5)), jnp.array([1.0, 1.0]))
    >>> feats.shape
    (2, 10, 5)
    """

    def __init__(
        self,
        mean_norm=True,
        std_norm=True,
        norm_type="global",
        avg_factor=None,
        length_dim=1,
        update_until_epoch=2,
        epsilon=1e-10,
    ):
        if norm_type not in ("sentence", "batch", "speaker", "global"):
            raise ValueError(f"Unknown norm_type {norm_type}")
        self.mean_norm = mean_norm
        self.std_norm = std_norm
        self.norm_type = norm_type
        self.avg_factor = avg_factor
        self.update_until_epoch = update_until_epoch
        self.epsilon = epsilon
        self.glob_mean = 0.0
        self.glob_std = 1.0
        self.spk_dict_mean = {}
        self.spk_dict_std = {}
        self.spk_dict_count = {}
        self.count = 0

    def _masked_moments(self, x, lengths):
        """Per-sentence masked mean/std over time: returns (B, 1, F)."""
        T = x.shape[1]
        mask = (
            jnp.arange(T)[None, :] < jnp.round(lengths * T)[:, None]
        ).astype(x.dtype)
        shape = mask.shape + (1,) * (x.ndim - 2)
        mask = mask.reshape(shape)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / denom
        var = jnp.sum(((x - mean) ** 2) * mask, axis=1, keepdims=True) / denom
        std = jnp.sqrt(var + self.epsilon)
        return mean, std

    def __call__(self, x, lengths, spk_ids=None, epoch=None):
        mean, std = self._masked_moments(x, lengths)
        if not self.mean_norm:
            mean = jnp.zeros_like(mean)
        if not self.std_norm:
            std = jnp.ones_like(std)
        if self.norm_type == "sentence":
            return (x - mean) / std
        if self.norm_type == "batch":
            bmean = jnp.mean(mean, axis=0, keepdims=True)
            bstd = jnp.mean(std, axis=0, keepdims=True)
            return (x - bmean) / bstd
        if self.norm_type == "speaker":
            # host-side speaker accumulation (eager use only)
            out = []
            for i, spk in enumerate(list(spk_ids)):
                spk = str(spk)
                m_i = np.asarray(mean[i])
                s_i = np.asarray(std[i])
                if spk not in self.spk_dict_mean:
                    self.spk_dict_mean[spk] = m_i
                    self.spk_dict_std[spk] = s_i
                    self.spk_dict_count[spk] = 1
                else:
                    c = self.spk_dict_count[spk] + 1
                    self.spk_dict_count[spk] = c
                    w = 1.0 / c if self.avg_factor is None else self.avg_factor
                    self.spk_dict_mean[spk] = (1 - w) * self.spk_dict_mean[spk] + w * m_i
                    self.spk_dict_std[spk] = (1 - w) * self.spk_dict_std[spk] + w * s_i
                out.append(
                    (x[i] - self.spk_dict_mean[spk]) / self.spk_dict_std[spk]
                )
            return jnp.stack(out)
        # global
        import jax as _jax

        if isinstance(x, _jax.core.Tracer):
            raise RuntimeError(
                "InputNormalization(norm_type='global') keeps host-side "
                "running statistics and cannot run inside a jitted train "
                "step. Use norm_type='sentence' (pure), or pre-compute "
                "global stats and call .normalize(x) inside jit."
            )
        updating = epoch is None or epoch < self.update_until_epoch
        if updating:
            bmean = np.asarray(jnp.mean(mean, axis=0))
            bstd = np.asarray(jnp.mean(std, axis=0))
            if self.count == 0:
                self.glob_mean = bmean
                self.glob_std = bstd
            else:
                if self.avg_factor is None:
                    w = 1.0 / (self.count + 1)
                else:
                    w = self.avg_factor
                self.glob_mean = (1 - w) * self.glob_mean + w * bmean
                self.glob_std = (1 - w) * self.glob_std + w * bstd
            self.count += 1
        gm = jnp.asarray(self.glob_mean)
        gs = jnp.asarray(self.glob_std)
        if not self.mean_norm:
            gm = 0.0
        if not self.std_norm:
            gs = 1.0
        return (x - gm) / gs

    def normalize(self, x, mean=None, std=None):
        """Pure normalization with explicit statistics (jit-safe path)."""
        mean = jnp.asarray(self.glob_mean if mean is None else mean)
        std = jnp.asarray(self.glob_std if std is None else std)
        return (x - mean) / std

    def _state(self):
        return {
            "glob_mean": np.asarray(self.glob_mean),
            "glob_std": np.asarray(self.glob_std),
            "count": self.count,
            "spk_dict_mean": {k: np.asarray(v) for k, v in self.spk_dict_mean.items()},
            "spk_dict_std": {k: np.asarray(v) for k, v in self.spk_dict_std.items()},
            "spk_dict_count": dict(self.spk_dict_count),
        }

    @mark_as_saver
    def _save(self, path):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self._state(), f)

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.glob_mean = state["glob_mean"]
        self.glob_std = state["glob_std"]
        self.count = int(state["count"])
        self.spk_dict_mean = state["spk_dict_mean"]
        self.spk_dict_std = state["spk_dict_std"]
        self.spk_dict_count = state["spk_dict_count"]

    @mark_as_transfer
    def _transfer(self, path):
        self._load(path)


class GlobalNorm:
    """Normalize to a target mean/std learned from the first batches
    (TTS-side; reference processing/features.py:1618)."""

    def __init__(
        self, norm_mean=0.0, norm_std=1.0, update_steps=None, length_dim=2, mask_value=0.0
    ):
        self.norm_mean = norm_mean
        self.norm_std = norm_std
        self.update_steps = update_steps
        self.mask_value = mask_value
        self.step_count = 0
        self.running_mean = 0.0
        self.running_std = 1.0
        self.weight = 0.0
        self.frozen = False

    def freeze(self):
        self.frozen = True

    def unfreeze(self):
        self.frozen = False

    def __call__(self, x, lengths=None):
        if not self.frozen and (
            self.update_steps is None or self.step_count < self.update_steps
        ):
            m = float(jnp.mean(x))
            s = float(jnp.std(x))
            w = 1.0 / (self.step_count + 1)
            self.running_mean = (1 - w) * self.running_mean + w * m
            self.running_std = (1 - w) * self.running_std + w * s
            self.step_count += 1
        x = (x - self.running_mean) / (self.running_std + 1e-8)
        return x * self.norm_std + self.norm_mean

    def denormalize(self, x):
        x = (x - self.norm_mean) / self.norm_std
        return x * (self.running_std + 1e-8) + self.running_mean


class MinLevelNorm:
    """Audio-power normalization to [-1, 1] given a min dB level
    (reference processing/features.py:1801)."""

    def __init__(self, min_level_db):
        self.min_level_db = min_level_db

    def __call__(self, x):
        return jnp.clip((x - self.min_level_db) / -self.min_level_db, 0.0, 1.0) * 2.0 - 1.0

    def denormalize(self, x):
        x = jnp.clip(x, -1.0, 1.0)
        return (x + 1.0) / 2.0 * -self.min_level_db + self.min_level_db


class DynamicRangeCompression:
    """log(clip(x) * C) dynamic-range compression
    (reference processing/features.py:1875)."""

    def __init__(self, multiplier=1.0, clip_val=1e-5):
        self.multiplier = multiplier
        self.clip_val = clip_val

    def __call__(self, x):
        return jnp.log(jnp.clip(x, a_min=self.clip_val) * self.multiplier)


# ---------------------------------------------------------------------------
# Kaldi-compatible filterbanks (for consuming checkpoints trained on
# torchaudio.compliance.kaldi features, e.g. BEATs — ref lobes/models/
# beats.py:156 uses ta_kaldi.fbank)
# ---------------------------------------------------------------------------

def kaldi_mel_filterbank_matrix(num_bins=128, n_fft=512, sample_rate=16000,
                                low_freq=20.0, high_freq=0.0):
    """Kaldi mel banks: triangular in the MEL domain (not Hz), computed
    over the n_fft/2 FFT bins (nyquist excluded) — the torchaudio
    compliance.kaldi / Kaldi mel-banks formula."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq

    def to_mel(hz):
        return 1127.0 * np.log(1.0 + np.asarray(hz) / 700.0)

    num_fft_bins = n_fft // 2
    fft_bin_width = sample_rate / n_fft
    mel_low = to_mel(low_freq)
    mel_high = to_mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    left = mel_low + np.arange(num_bins) * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    freqs = fft_bin_width * np.arange(num_fft_bins)
    mel = to_mel(freqs)[None, :]  # (1, F)
    up = (mel - left[:, None]) / mel_delta
    down = (right[:, None] - mel) / mel_delta
    bank = np.maximum(0.0, np.minimum(up, down))  # (num_bins, F)
    return bank.T.astype(np.float32)  # (F, num_bins)


def kaldi_fbank(wav, num_mel_bins=128, frame_length=25.0, frame_shift=10.0,
                sample_rate=16000, preemphasis=0.97, remove_dc_offset=True,
                window_type="povey", low_freq=20.0, high_freq=0.0,
                use_log_fbank=True):
    """Jittable Kaldi-style log-mel filterbanks matching
    torchaudio.compliance.kaldi.fbank defaults: snip-edges framing,
    per-frame DC removal, pre-emphasis, povey window, power spectrum on
    the next power-of-two FFT, mel-domain triangular banks, natural log.

    wav: (B, T) float (BEATs feeds waveform * 2**15). Returns
    (B, n_frames, num_mel_bins).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> out = kaldi_fbank(jnp.ones((1, 16000)))
    >>> out.shape
    (1, 98, 128)
    """
    win = int(sample_rate * frame_length / 1000.0)
    hop = int(sample_rate * frame_shift / 1000.0)
    n_fft = 1
    while n_fft < win:
        n_fft *= 2
    B, T = wav.shape
    n_frames = max(0, 1 + (T - win) // hop)  # snip_edges framing
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    )
    frames = wav[:, idx]  # (B, n_frames, win)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    n = np.arange(win)
    if window_type == "povey":
        window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))) ** 0.85
    elif window_type == "hanning":
        window = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))
    elif window_type == "hamming":
        window = 0.54 - 0.46 * np.cos(2 * np.pi * n / (win - 1))
    else:
        raise ValueError(f"Unsupported window {window_type}")
    # window + DFT folded into two matmuls (MXU path; no complex dtypes)
    num_fft_bins = n_fft // 2
    k = np.arange(num_fft_bins)[None, :]
    nn_ = np.arange(win)[:, None]
    ang = 2.0 * np.pi * nn_ * k / n_fft
    w = window[:, None]
    cos_m = jnp.asarray(np.cos(ang) * w, jnp.float32)
    sin_m = jnp.asarray(-np.sin(ang) * w, jnp.float32)
    real = jnp.einsum("bfw,wk->bfk", frames, cos_m)
    imag = jnp.einsum("bfw,wk->bfk", frames, sin_m)
    power = real * real + imag * imag
    bank = jnp.asarray(
        kaldi_mel_filterbank_matrix(
            num_mel_bins, n_fft, sample_rate, low_freq, high_freq
        )
    )
    mel = jnp.einsum("bfk,km->bfm", power, bank)
    if use_log_fbank:
        mel = jnp.log(jnp.maximum(mel, 1.1921e-07))  # kaldi epsilon
    return mel


def combine_gaussian_statistics(statistics_list):
    """Combine (count, mean, variance) triples as if computed on the
    concatenation of the underlying data (reference
    processing/features.py:1100-style pooled moments).

    Example
    -------
    >>> import numpy as np
    >>> a = np.asarray([1.0, 2.0]); b = np.asarray([3.0, 4.0, 5.0])
    >>> stats = [(len(a), a.mean(), a.var()), (len(b), b.mean(), b.var())]
    >>> n, m, v = combine_gaussian_statistics(stats)
    >>> full = np.concatenate([a, b])
    >>> (n, float(m), round(float(v), 6)) == (
    ...     5, float(full.mean()), round(float(full.var()), 6))
    True
    """
    total = sum(c for c, _, _ in statistics_list)
    mean = sum((c / total) * m for c, m, _ in statistics_list)
    variance = sum(
        (c / total) * (v + (m - mean) ** 2) for c, m, v in statistics_list
    )
    return total, mean, variance


def combine_gaussian_statistics_distributed(statistics):
    """All-reduce (count, mean, variance) across processes so every host
    holds the statistics of the concatenated global data (reference
    processing/features.py:1147; TPU: multihost all-reduce instead of
    torch.distributed)."""
    from speechbrain_tpu.parallel.distributed import ddp_all_reduce

    local_count, local_mean, local_variance = statistics
    global_count = float(ddp_all_reduce(np.asarray(local_count), op="sum"))
    weight = local_count / global_count
    global_mean = ddp_all_reduce(
        np.asarray(weight * local_mean), op="sum"
    )
    compensated = local_variance + np.square(
        np.asarray(local_mean) - np.asarray(global_mean)
    )
    global_variance = ddp_all_reduce(
        np.asarray(weight * compensated), op="sum"
    )
    return global_count, global_mean, global_variance


def mean_std_update(x, mask, dim, run_count, run_mean, run_std):
    """Fold new (masked) samples into running mean/std statistics,
    synchronized across processes (reference features.py:1192). Returns
    (new_count, new_mean, new_std)."""
    x = jnp.asarray(x)
    if mask is not None:
        mask = jnp.asarray(mask, x.dtype)
        count = float(jnp.sum(mask))
        denom = jnp.maximum(count, 1.0)
        mean = jnp.sum(x * mask, axis=dim) / denom
        var = jnp.sum(((x - mean) ** 2) * mask, axis=dim) / denom
    else:
        sizes = (
            np.prod([x.shape[d] for d in np.atleast_1d(dim)])
            if dim is not None else x.size
        )
        count = float(sizes)
        mean = jnp.mean(x, axis=dim)
        var = jnp.var(x, axis=dim)
    count, mean, var = combine_gaussian_statistics_distributed(
        (count, np.asarray(mean), np.asarray(var))
    )
    new_count, new_mean, new_var = combine_gaussian_statistics(
        [
            (run_count, np.asarray(run_mean), np.square(np.asarray(run_std))),
            (count, mean, var),
        ]
    )
    return new_count, new_mean, np.sqrt(np.maximum(new_var, 0.0))
