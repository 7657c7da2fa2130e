"""Checkpointable RNG state.

Capability parity with the reference's ``speechbrain/utils/repro.py``
(SaveableGenerator :18): in JAX, randomness is a key you thread, so exact
resume means saving/restoring the key — this wrapper makes a key
checkpointable and splittable in place.
"""

import numpy as np

from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)


@register_checkpoint_hooks
class SaveableRNG:
    """Holds a PRNG key; ``next()`` splits and returns a subkey.

    Example
    -------
    >>> rng = SaveableRNG(seed=42)
    >>> k1 = rng.next()
    >>> k2 = rng.next()
    >>> bool((np.asarray(k1) != np.asarray(k2)).any())
    True
    """

    def __init__(self, seed=0):
        import jax

        self.key = jax.random.PRNGKey(seed)

    def next(self):
        import jax

        self.key, sub = jax.random.split(self.key)
        return sub

    @mark_as_saver
    def _save(self, path):
        np.asarray(self.key).tofile(path)

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        import jax.numpy as jnp

        data = np.fromfile(path, dtype=np.uint32)
        self.key = jnp.asarray(data.reshape(-1)[:2])
