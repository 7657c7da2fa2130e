"""Persistent XLA compilation cache control.

Large jitted programs (the beam-search decode loop, conformer-large
training steps) take minutes to compile on TPU; the persistent cache
makes every process after the first load them in milliseconds. JAX only
engages the on-disk cache when ``jax_compilation_cache_dir`` is set
through ``jax.config`` — exporting ``JAX_COMPILATION_CACHE_DIR`` alone
is NOT sufficient on all plugin backends (measured: the axon TPU plugin
ignores the bare env var), so call :func:`enable_persistent_cache` once
at process start (bench.py and the serving entry points do).

No reference counterpart: torch caches kernels in-process only; this is
TPU/XLA-specific serving infrastructure (see docs/serving.md).
"""

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"
)


def enable_persistent_cache(cache_dir=None, min_compile_secs=1.0):
    """Turn on the on-disk XLA compilation cache.

    Arguments
    ---------
    cache_dir : str, optional
        Directory for serialized executables (created lazily). Defaults
        to ``$JAX_COMPILATION_CACHE_DIR`` or ``/tmp/jax_comp_cache``.
    min_compile_secs : float
        Only compilations slower than this are persisted (skip
        trivially-recompilable programs).

    Returns
    -------
    str
        The cache directory in effect.
    """
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
