"""Mixed-precision helpers.

Capability parity with the reference's ``speechbrain/utils/autocast.py``
(AMPConfig at autocast.py:18, TorchAutocast :56, fwd_default_precision
:167), re-designed for XLA: there is no autocast context on TPU — the
policy is explicit dtype casts at function boundaries, with fp32 forced
where the reference forces it (losses, normalization statistics).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class AMPConfig:
    """Precision policy (reference autocast.py:18)."""

    dtype: object = jnp.bfloat16

    @classmethod
    def from_name(cls, name):
        """'fp32' | 'fp16' | 'bf16' -> config."""
        table = {
            "fp32": jnp.float32,
            "float32": jnp.float32,
            "fp16": jnp.float16,
            "float16": jnp.float16,
            "bf16": jnp.bfloat16,
            "bfloat16": jnp.bfloat16,
            None: jnp.float32,
        }
        if name not in table:
            raise ValueError(f"unknown precision {name!r}")
        return cls(dtype=table[name])


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def fwd_default_precision(fwd=None, cast_inputs=jnp.float32):
    """Decorator forcing a function's floating inputs to a dtype
    (reference autocast.py:167) — used to keep numerically sensitive
    paths (losses, statistics) in fp32 under a bf16 policy.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> @fwd_default_precision
    ... def f(x):
    ...     return x.dtype
    >>> str(f(jnp.ones(2, jnp.bfloat16)))
    'float32'
    """
    if fwd is None:
        return functools.partial(
            fwd_default_precision, cast_inputs=cast_inputs
        )

    @functools.wraps(fwd)
    def wrapper(*args, force_allow_autocast=False, **kwargs):
        if force_allow_autocast:
            return fwd(*args, **kwargs)
        args = cast_floats(args, cast_inputs)
        kwargs = cast_floats(kwargs, cast_inputs)
        return fwd(*args, **kwargs)

    return wrapper
