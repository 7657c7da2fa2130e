"""Clinical/vocal features: jitter, shimmer, HNR, GNE, formants.

Capability parity with the reference's
``speechbrain/processing/vocal_features.py`` (compute_autocorr_features,
compute_periodic_features, compute_spectral_features, compute_gne):
frame-based voice-quality measures used in pathology recipes.
"""

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.processing.features import frame_signal


def compute_autocorr_features(frames, min_lag, max_lag):
    """Harmonicity + best lag per frame via autocorrelation.

    frames: (B, N, L). Returns (harmonicity (B,N), best_lags (B,N)).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> t = np.arange(512) / 16000
    >>> sig = np.sin(2 * np.pi * 200 * t).astype("float32")  # 80-sample period
    >>> frames = jnp.asarray(sig[None, None, :])
    >>> h, lag = compute_autocorr_features(frames, 60, 100)
    >>> bool(abs(int(lag[0, 0]) - 80) <= 1), bool(h[0, 0] > 0.8)
    (True, True)
    """
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    L = frames.shape[-1]
    spec = jnp.fft.rfft(frames, n=2 * L, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), axis=-1)[..., :L]
    ac = ac / jnp.maximum(ac[..., :1], 1e-9)
    window = ac[..., min_lag:max_lag]
    best = jnp.argmax(window, axis=-1) + min_lag
    harmonicity = jnp.max(window, axis=-1)
    return harmonicity, best


def compute_periodic_features(frames, best_lags):
    """Jitter (period perturbation) & shimmer (amplitude perturbation)."""
    lags = np.asarray(best_lags, np.float64)
    jitter = np.abs(np.diff(lags, axis=-1)) / np.maximum(lags[..., 1:], 1e-9)
    amps = np.asarray(jnp.max(jnp.abs(frames), axis=-1), np.float64)
    shimmer = np.abs(np.diff(amps, axis=-1)) / np.maximum(amps[..., 1:], 1e-9)
    pad = lambda x: np.concatenate([x[..., :1], x], axis=-1)
    return pad(jitter), pad(shimmer)


def compute_spectral_features(power_spectra, eps=1e-10):
    """Centroid, spread, skew, kurtosis, entropy, flatness, crest, flux.

    power_spectra: (B, N, F). Returns dict of (B, N) features.
    """
    ps = jnp.maximum(power_spectra, eps)
    F = ps.shape[-1]
    freqs = jnp.arange(F) / F
    total = jnp.sum(ps, axis=-1, keepdims=True)
    p = ps / total
    centroid = jnp.sum(freqs * p, axis=-1)
    spread = jnp.sqrt(jnp.sum(((freqs - centroid[..., None]) ** 2) * p, axis=-1))
    skew = jnp.sum(((freqs - centroid[..., None]) ** 3) * p, axis=-1) / jnp.maximum(
        spread**3, eps
    )
    kurt = jnp.sum(((freqs - centroid[..., None]) ** 4) * p, axis=-1) / jnp.maximum(
        spread**4, eps
    )
    entropy = -jnp.sum(p * jnp.log(p), axis=-1) / np.log(F)
    flatness = jnp.exp(jnp.mean(jnp.log(ps), axis=-1)) / jnp.mean(ps, axis=-1)
    crest = jnp.max(ps, axis=-1) / jnp.mean(ps, axis=-1)
    flux = jnp.concatenate(
        [
            jnp.zeros(ps.shape[:-2] + (1,)),
            jnp.sqrt(jnp.sum(jnp.diff(ps, axis=-2) ** 2, axis=-1)),
        ],
        axis=-1,
    )
    return {
        "centroid": centroid, "spread": spread, "skew": skew,
        "kurtosis": kurt, "entropy": entropy, "flatness": flatness,
        "crest": crest, "flux": flux,
    }


def compute_hnr(frames, min_lag, max_lag, eps=1e-9):
    """Harmonics-to-noise ratio in dB from autocorrelation harmonicity."""
    h, _ = compute_autocorr_features(frames, min_lag, max_lag)
    h = jnp.clip(h, eps, 1 - eps)
    return 10.0 * jnp.log10(h / (1 - h))


def compute_gne(audio, sample_rate=16000, bandwidth=1000, fshift=300):
    """Glottal-to-noise excitation ratio (simplified band-correlation
    formulation of the reference's compute_gne)."""
    audio = jnp.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None]
    frames = frame_signal(audio, 2048, 1024, center=False)
    spec = jnp.fft.rfft(frames, axis=-1)
    F = spec.shape[-1]
    band_w = int(bandwidth / (sample_rate / 2) * F)
    shift = int(fshift / (sample_rate / 2) * F)
    n_bands = max(1, (F - band_w) // shift)
    envs = []
    for b in range(n_bands):
        band = jnp.zeros_like(spec)
        band = band.at[..., b * shift : b * shift + band_w].set(
            spec[..., b * shift : b * shift + band_w]
        )
        env = jnp.abs(jnp.fft.irfft(band, axis=-1))
        env = env - env.mean(axis=-1, keepdims=True)
        envs.append(env / jnp.maximum(jnp.linalg.norm(env, axis=-1, keepdims=True), 1e-9))
    best = None
    for i in range(n_bands):
        for j in range(i + 1, n_bands):
            corr = jnp.max(
                jnp.abs(
                    jnp.fft.irfft(
                        jnp.fft.rfft(envs[i], axis=-1)
                        * jnp.conj(jnp.fft.rfft(envs[j], axis=-1)),
                        axis=-1,
                    )
                ),
                axis=-1,
            )
            best = corr if best is None else jnp.maximum(best, corr)
    return best
