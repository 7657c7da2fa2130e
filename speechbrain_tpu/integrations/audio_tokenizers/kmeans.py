"""Mini-batch k-means on device.

Capability parity with the reference's
``speechbrain/integrations/audio_tokenizers/kmeans.py``
(MiniBatchKMeansSklearn at kmeans.py:14), re-designed for TPU: instead
of wrapping sklearn (host-side, single-threaded), the assignment step is
one jitted matmul (MXU) and the center update is a segment-sum, so
tokenizing SSL features for a whole corpus stays on device.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.utils.kmeans import kmeans_fit, kmeans_predict


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _minibatch_update(centers, counts, x):
    """One sparse mini-batch k-means step (Sculley 2010): per-center
    learning rate 1/count."""
    labels = kmeans_predict(x, centers)
    onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=x.dtype)
    batch_counts = onehot.sum(axis=0)
    new_counts = counts + batch_counts
    sums = onehot.T @ x
    lr = batch_counts / jnp.maximum(new_counts, 1.0)
    batch_means = sums / jnp.maximum(batch_counts[:, None], 1.0)
    new_centers = centers + lr[:, None] * (batch_means - centers)
    new_centers = jnp.where(
        batch_counts[:, None] > 0, new_centers, centers
    )
    return new_centers, new_counts


@jax.jit
def _inertia(x, centers):
    d2 = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2 * x @ centers.T
        + jnp.sum(centers**2, -1)[None]
    )
    return jnp.sum(jnp.min(d2, axis=-1))


class MiniBatchKMeans:
    """Stateful mini-batch k-means tokenizer (reference kmeans.py:14).

    ``fit(x)`` runs full Lloyd iterations; ``partial_fit(x)`` streams
    mini-batches; ``__call__(x)`` / ``predict(x)`` assigns cluster ids.

    Example
    -------
    >>> import numpy as np
    >>> km = MiniBatchKMeans(n_clusters=4, seed=0)
    >>> x = np.random.default_rng(0).normal(size=(256, 8)).astype("float32")
    >>> km.fit(x)
    >>> km(x[:10]).shape
    (10,)
    """

    def __init__(self, n_clusters=128, seed=0, n_iters=50, **kwargs):
        self.n_clusters = n_clusters
        self.seed = seed
        self.n_iters = n_iters
        self.centers = None
        self.counts = None
        self._steps = 0

    def _flat(self, x):
        x = jnp.asarray(x, jnp.float32)
        return x.reshape(-1, x.shape[-1])

    def fit(self, input):
        """Full-batch Lloyd fit."""
        x = self._flat(input)
        self.centers, _ = kmeans_fit(
            x, self.n_clusters, n_iters=self.n_iters,
            rng=jax.random.PRNGKey(self.seed),
        )
        self.centers = jnp.asarray(self.centers)
        self.counts = jnp.zeros((self.n_clusters,), jnp.float32)
        self._steps += 1

    def partial_fit(self, input):
        """One streamed mini-batch update; initializes centers from the
        first batch if unfit."""
        x = self._flat(input)
        if self.centers is None:
            idx = jax.random.choice(
                jax.random.PRNGKey(self.seed), x.shape[0],
                (self.n_clusters,), replace=x.shape[0] < self.n_clusters,
            )
            self.centers = x[idx]
            self.counts = jnp.zeros((self.n_clusters,), jnp.float32)
        self.centers, self.counts = _minibatch_update(
            self.centers, self.counts, x
        )
        self._steps += 1

    def predict(self, input):
        if self.centers is None:
            raise RuntimeError("MiniBatchKMeans is not fit yet.")
        return kmeans_predict(self._flat(input), self.centers)

    __call__ = predict

    def forward(self, input):
        return self.predict(input)

    def inertia(self, input):
        """Sum of squared distances to the closest center."""
        return float(_inertia(self._flat(input), self.centers))

    @property
    def n_steps(self):
        return self._steps

    @property
    def cluster_centers_(self):
        return np.asarray(self.centers)

    def save(self, path):
        np.savez(
            path, centers=np.asarray(self.centers),
            counts=np.asarray(self.counts), steps=self._steps,
        )

    def load(self, path, end_of_epoch=False):
        with np.load(path) as d:
            self.centers = jnp.asarray(d["centers"])
            self.counts = jnp.asarray(d["counts"])
            self._steps = int(d["steps"])
