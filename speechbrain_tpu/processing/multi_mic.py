"""Multi-microphone processing: covariance, TDOA, beamforming, localization.

Capability parity with the reference's ``speechbrain/processing/multi_mic.py``
(Covariance :87, GccPhat :662, DelaySum :197, Mvdr :340, Gev :525,
SrpPhat, Music localization): all operate on complex STFTs with layout
(batch, time, freq, channel) [reference uses (..., 2, channel) real/imag;
complex arrays here], jit-safe.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def _xs_pairs(n_mics, full=True):
    """Index pairs (p, q) for covariance vectorization."""
    idx = []
    for p in range(n_mics):
        for q in range(p, n_mics):
            idx.append((p, q))
    return np.asarray(idx)


class Covariance:
    """Spatial covariance of a multi-channel STFT
    (reference multi_mic.py:87): (B, T, F, C) -> (B, T, F, C, C)
    (averaged over time if average=True).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> cov = Covariance()
    >>> Xs = jnp.ones((1, 10, 5, 4), dtype=jnp.complex64)
    >>> cov(Xs).shape
    (1, 10, 5, 4, 4)
    """

    def __init__(self, average=True):
        self.average = average

    def __call__(self, Xs):
        XXs = jnp.einsum("btfc,btfd->btfcd", Xs, jnp.conj(Xs))
        if self.average:
            mean = jnp.mean(XXs, axis=1, keepdims=True)
            XXs = jnp.broadcast_to(mean, XXs.shape)
        return XXs


class GccPhat:
    """GCC-PHAT time differences of arrival (reference multi_mic.py:662).

    Returns per-pair TDOAs (B, T, C, C) in samples.
    """

    def __init__(self, tdoa_max=None, eps=1e-20):
        self.tdoa_max = tdoa_max
        self.eps = eps

    def __call__(self, XXs):
        # XXs: (B, T, F, C, C) one-sided cross-spectra
        B, T, F, C, _ = XXs.shape
        n_fft = 2 * (F - 1)
        phat = XXs / (jnp.abs(XXs) + self.eps)
        # inverse rfft over freq -> cross-correlation
        xcorr = jnp.fft.irfft(
            jnp.moveaxis(phat, 2, -1), n=n_fft, axis=-1
        )  # (B, T, C, C, n_fft)
        tdoa_max = self.tdoa_max or n_fft // 2
        # allow negative delays: concat tail & head
        cc = jnp.concatenate(
            [xcorr[..., -tdoa_max:], xcorr[..., : tdoa_max + 1]], axis=-1
        )
        delay = jnp.argmax(jnp.abs(cc), axis=-1) - tdoa_max
        return delay.astype(jnp.float32)


def steering_vector(tdoas, n_fft, n_freq=None):
    """Steering vectors from TDOAs (B, T, C) -> (B, T, F, C) complex."""
    F = n_freq or n_fft // 2 + 1
    omegas = 2.0 * math.pi * jnp.arange(F) / n_fft  # (F,)
    phases = -omegas[None, None, :, None] * tdoas[:, :, None, :]
    return jnp.exp(1j * phases)


class DelaySum:
    """Delay-and-sum beamforming (reference multi_mic.py:197).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> ds = DelaySum()
    >>> Xs = jnp.ones((1, 10, 9, 4), jnp.complex64)
    >>> tdoas = jnp.zeros((1, 10, 4))
    >>> ds(Xs, tdoas, n_fft=16).shape
    (1, 10, 9)
    """

    def __call__(self, Xs, tdoas, n_fft):
        A = steering_vector(tdoas, n_fft, Xs.shape[2])
        Ys = jnp.sum(jnp.conj(A) * Xs, axis=-1) / Xs.shape[-1]
        return Ys


class Mvdr:
    """Minimum-variance distortionless-response beamforming
    (reference multi_mic.py:340): w = (Phi_nn^-1 a) / (a^H Phi_nn^-1 a)."""

    def __init__(self, eps=1e-6):
        self.eps = eps

    def __call__(self, Xs, NNs, tdoas, n_fft):
        B, T, F, C = Xs.shape
        A = steering_vector(tdoas, n_fft, F)  # (B, T, F, C)
        eye = jnp.eye(C, dtype=NNs.dtype)
        NNs_reg = NNs + self.eps * eye
        a = A[..., None]  # (B,T,F,C,1)
        sol = jnp.linalg.solve(NNs_reg, a)  # Phi^-1 a
        denom = jnp.einsum("btfcx,btfcx->btfx", jnp.conj(a), sol)
        w = sol / (denom[..., None, :] + self.eps)
        Ys = jnp.einsum("btfcx,btfc->btf", jnp.conj(w), Xs)
        return Ys


class Gev:
    """Generalized-eigenvector beamforming (reference multi_mic.py:525):
    maximize SNR via the principal eigenvector of Phi_nn^-1 Phi_ss
    (power iteration — jit-friendly, no complex eig needed)."""

    def __init__(self, iterations=10, eps=1e-6):
        self.iterations = iterations
        self.eps = eps

    def __call__(self, Xs, SSs, NNs):
        B, T, F, C, _ = SSs.shape
        eye = jnp.eye(C, dtype=NNs.dtype)
        M = jnp.linalg.solve(NNs + self.eps * eye, SSs)
        w = jnp.ones(M.shape[:-1] + (1,), M.dtype) / math.sqrt(C)
        for _ in range(self.iterations):
            w = jnp.matmul(M, w)
            norm = jnp.linalg.norm(w, axis=-2, keepdims=True)
            w = w / jnp.maximum(norm.real, self.eps)
        w = w[..., 0]  # (B,T,F,C)
        Ys = jnp.einsum("btfc,btfc->btf", jnp.conj(w), Xs)
        return Ys


class SrpPhat:
    """SRP-PHAT direction-of-arrival search over a sphere of candidate
    directions (reference multi_mic.py SrpPhat)."""

    def __init__(self, mics, space="sphere", sample_rate=16000, speed_sound=343.0,
                 eps=1e-20, n_dirs=200):
        self.mics = np.asarray(mics)  # (C, 3) positions in meters
        self.sample_rate = sample_rate
        self.speed_sound = speed_sound
        self.eps = eps
        self.dirs = self._sphere(n_dirs)
        # TDOAs per direction & mic: tau = (d . m) * fs / c
        self.taus = (
            self.dirs @ self.mics.T * sample_rate / speed_sound
        )  # (n_dirs, C)

    @staticmethod
    def _sphere(n):
        i = np.arange(n) + 0.5
        phi = np.arccos(1 - 2 * i / n)
        theta = math.pi * (1 + 5**0.5) * i
        return np.stack(
            [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
            axis=1,
        )

    def __call__(self, XXs):
        """XXs (B, T, F, C, C) -> unit direction (B, T, 3)."""
        B, T, F, C, _ = XXs.shape
        n_fft = 2 * (F - 1)
        phat = XXs / (jnp.abs(XXs) + self.eps)
        omegas = 2.0 * math.pi * jnp.arange(F) / n_fft
        taus = jnp.asarray(self.taus)  # (D, C)
        dt = taus[:, :, None] - taus[:, None, :]  # (D, C, C)
        # steering cross terms e^{j w dt}
        E = jnp.exp(
            1j * omegas[None, :, None, None] * dt[:, None, :, :]
        )  # (D, F, C, C)
        srp = jnp.einsum("btfcd,xfcd->btx", phat, jnp.conj(E)).real
        best = jnp.argmax(srp, axis=-1)  # (B, T)
        return jnp.asarray(self.dirs)[best]


class Music(SrpPhat):
    """MUSIC localization via noise-subspace power iteration
    (reference multi_mic.py Music) — approximated with SRP on the
    dominant-eigenvector-removed covariance."""

    def __call__(self, XXs):
        # deflate the dominant (signal) eigenvector then run SRP on the rest
        B, T, F, C, _ = XXs.shape
        v = jnp.ones(XXs.shape[:-1] + (1,), XXs.dtype) / math.sqrt(C)
        for _ in range(8):
            v = jnp.matmul(XXs, v)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-2, keepdims=True).real, 1e-9)
        lam = jnp.einsum("btfcx,btfcx->btfx", jnp.conj(v), jnp.matmul(XXs, v))
        deflated = XXs - lam[..., None, :] * jnp.matmul(
            v, jnp.conj(jnp.swapaxes(v, -1, -2))
        )
        # MUSIC pseudo-spectrum peaks where deflated (noise) power is lowest:
        # approximate by SRP on the *negated* deflated covariance
        return super().__call__(-deflated)
