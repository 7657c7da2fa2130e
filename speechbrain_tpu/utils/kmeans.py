"""K-means clustering (jit-friendly Lloyd iterations).

Capability parity with the reference's ``speechbrain/utils/kmeans.py``
(sklearn MiniBatchKMeans wrapper): used for discrete SSL units and
diarization.
"""

import jax
import jax.numpy as jnp
import numpy as np


def kmeans_fit(x, n_clusters, n_iters=50, rng=None):
    """Lloyd's algorithm on (N, D) data; returns (centroids, assignments).

    Example
    -------
    >>> import numpy as np
    >>> pts = np.concatenate([np.zeros((10, 2)), np.ones((10, 2)) * 5])
    >>> cents, assign = kmeans_fit(pts, 2, rng=np.random.default_rng(0))
    >>> len(set(assign[:10].tolist())), len(set(assign[10:].tolist()))
    (1, 1)
    """
    if rng is None:
        rng = np.random.default_rng(0)
    x = jnp.asarray(x, jnp.float32)
    N = x.shape[0]
    if isinstance(rng, jnp.ndarray):  # a jax PRNGKey
        init_idx = np.asarray(
            jax.random.choice(rng, N, (n_clusters,), replace=False)
        )
    else:
        init_idx = rng.choice(N, size=n_clusters, replace=False)
    centroids = x[jnp.asarray(init_idx)]

    @jax.jit
    def step(centroids):
        d = jnp.sum((x[:, None, :] - centroids[None]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, centroids.shape[0])
        counts = onehot.sum(axis=0)
        sums = onehot.T @ x
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids
        )
        return new, assign

    for _ in range(n_iters):
        centroids, assign = step(centroids)
    return np.asarray(centroids), np.asarray(assign)


def kmeans_predict(x, centroids):
    """Nearest-centroid assignment (jit-safe; one matmul on the MXU)."""
    x = jnp.asarray(x)
    c = jnp.asarray(centroids)
    d = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2 * x @ c.T
        + jnp.sum(c**2, -1)[None]
    )
    return jnp.argmin(d, axis=-1)
