"""Non-negative matrix factorization source separation.

Capability parity with the reference's ``speechbrain/processing/NMF.py``
(spectral_phase, NMF_separate_spectra, reconstruct_results):
multiplicative-update NMF on magnitude spectra with pretrained template
dictionaries per source.
"""

import jax.numpy as jnp
import numpy as np


def spectral_phase(stft):
    """Phase of a complex STFT."""
    return jnp.angle(stft)


def nmf_decompose(V, n_components, n_iter=100, eps=1e-10, rng=None):
    """Factor V (F, T) >= 0 into W (F, K) H (K, T) by multiplicative
    updates.

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> V = np.abs(rng.standard_normal((16, 20)))
    >>> W, H = nmf_decompose(V, 4, n_iter=50, rng=rng)
    >>> rec = W @ H
    >>> float(np.mean((V - rec) ** 2)) < float(np.mean(V ** 2))
    True
    """
    rng = rng or np.random.default_rng(0)
    F, T = V.shape
    W = np.abs(rng.standard_normal((F, n_components))) + eps
    H = np.abs(rng.standard_normal((n_components, T))) + eps
    V = np.maximum(np.asarray(V), eps)
    for _ in range(n_iter):
        H *= (W.T @ V) / np.maximum(W.T @ (W @ H), eps)
        W *= (V @ H.T) / np.maximum((W @ H) @ H.T, eps)
        W /= np.maximum(W.sum(axis=0, keepdims=True), eps)
    return W, H


def NMF_separate_spectra(Whats, Xmix):
    """Separate a mixture magnitude spectrum with per-source dictionaries
    (reference NMF.py:NMF_separate_spectra).

    Whats: [W1 (F, K1), W2 (F, K2)]; Xmix: (B, T, F) magnitudes.
    Returns per-source magnitude estimates (B, T, F) each.
    """
    W1, W2 = [np.asarray(w) for w in Whats]
    W = np.concatenate([W1, W2], axis=1)
    K1 = W1.shape[1]
    outs1, outs2 = [], []
    for b in range(Xmix.shape[0]):
        V = np.asarray(Xmix[b]).T  # (F, T)
        eps = 1e-10
        K = W.shape[1]
        H = np.abs(np.random.default_rng(0).standard_normal((K, V.shape[1]))) + eps
        for _ in range(100):
            H *= (W.T @ np.maximum(V, eps)) / np.maximum(W.T @ (W @ H), eps)
        rec1 = W[:, :K1] @ H[:K1]
        rec2 = W[:, K1:] @ H[K1:]
        total = np.maximum(rec1 + rec2, eps)
        outs1.append((V * rec1 / total).T)
        outs2.append((V * rec2 / total).T)
    return np.stack(outs1), np.stack(outs2)


def reconstruct_results(X1hat, X2hat, X_stft, sample_rate, win_length, hop_length):
    """Magnitudes + mixture phase -> time-domain sources."""
    from speechbrain_tpu.processing.features import ISTFT

    istft = ISTFT(
        sample_rate=sample_rate, win_length=win_length, hop_length=hop_length
    )
    phase = spectral_phase(X_stft)
    out = []
    for Xhat in (X1hat, X2hat):
        spec = jnp.asarray(Xhat) * jnp.exp(1j * phase)
        out.append(istft(spec))
    return out
