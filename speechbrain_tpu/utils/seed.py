"""Reproducible seeding for python / numpy / JAX.

Capability parity with the reference's ``speechbrain/utils/seed.py:20``
(seed_everything), adapted to JAX: instead of mutating global torch RNG
state, we return a ``jax.random.PRNGKey`` — JAX randomness is functional,
so the key is the seed. Host-side randomness (python ``random``, numpy)
is still seeded globally for data-pipeline reproducibility.

Example
-------
>>> key = seed_everything(1234)
>>> int(key[1])
1234
"""

import logging
import os
import random

import numpy as np

logger = logging.getLogger(__name__)

max_seed_value = np.iinfo(np.uint32).max
min_seed_value = np.iinfo(np.uint32).min


def seed_everything(seed: int = 0, verbose: bool = True, deterministic=None):
    """Seed python, numpy and derive a JAX PRNGKey.

    Arguments
    ---------
    seed : int
        The seed. Out-of-range values are clamped to uint32 range.
    verbose : bool
        Log the seed in use.
    deterministic : bool, optional
        Accepted for API parity; XLA on TPU is deterministic by default
        for a fixed program + seed, so this is a no-op.

    Returns
    -------
    jax.random.PRNGKey
        Key derived from the seed, for device-side randomness.
    """
    import jax

    if not (min_seed_value <= seed <= max_seed_value):
        if verbose:
            logger.info("%d is out of bounds, numpy accepts from %d to %d",
                        seed, min_seed_value, max_seed_value)
        seed = 0

    if verbose:
        logger.info("Setting seed to %d", seed)

    os.environ["SB_GLOBAL_SEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
