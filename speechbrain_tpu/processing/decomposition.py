"""Generalized eigenvalue decomposition helpers for beamforming.

Capability parity with the reference's
``speechbrain/processing/decomposition.py`` (gevd, svdl, f/ginv utilities):
GEVD of hermitian covariance pairs via Cholesky whitening, numpy-based
(offline beamformer design).
"""

import numpy as np


def pos_def_matrix(A, eps=1e-10):
    """Hermitian-symmetrize + regularize."""
    A = np.asarray(A)
    return (A + A.conj().swapaxes(-1, -2)) / 2 + eps * np.eye(A.shape[-1])


def gevd(SS, NN, eps=1e-10):
    """Generalized eigenvalue decomposition of (SS, NN) hermitian pairs.

    Returns (eigenvalues ascending, eigenvectors) solving SS v = w NN v.

    Example
    -------
    >>> import numpy as np
    >>> SS = np.diag([1.0, 4.0]); NN = np.eye(2)
    >>> w, V = gevd(SS, NN)
    >>> np.round(w, 3).tolist()
    [1.0, 4.0]
    """
    SS = pos_def_matrix(SS, eps)
    NN = pos_def_matrix(NN, eps)
    L = np.linalg.cholesky(NN)
    Linv = np.linalg.inv(L)
    M = Linv @ SS @ Linv.conj().swapaxes(-1, -2)
    w, U = np.linalg.eigh(M)
    V = Linv.conj().swapaxes(-1, -2) @ U
    return w, V


def svdl(A):
    """SVD keeping left singular vectors (reference decomposition.py svdl)."""
    U, s, _ = np.linalg.svd(np.asarray(A))
    return U, s


def ginv(A, eps=1e-10):
    """Regularized hermitian inverse."""
    return np.linalg.inv(pos_def_matrix(A, eps))
