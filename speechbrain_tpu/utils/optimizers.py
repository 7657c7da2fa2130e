"""Optimizer helpers.

Capability parity with the reference's ``speechbrain/utils/optimizers.py``
(rm_vector_weight_decay at optimizers.py:8): exclude 1-D parameters
(biases, norm scales) from weight decay. In optax this is a mask for
``optax.add_decayed_weights`` / ``optax.adamw(..., mask=...)`` instead
of torch param groups.
"""

import jax
import jax.numpy as jnp


def vector_weight_decay_mask(params):
    """Pytree mask: True for params that SHOULD be decayed (ndim > 1).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> p = {"w": jnp.ones((3, 4)), "b": jnp.ones((4,))}
    >>> vector_weight_decay_mask(p)
    {'b': False, 'w': True}
    """
    return jax.tree_util.tree_map(lambda x: jnp.ndim(x) > 1, params)


def rm_vector_weight_decay(params):
    """Reference-named alias of :func:`vector_weight_decay_mask`: pass
    the result as ``mask=`` to optax.adamw to skip decaying vectors."""
    return vector_weight_decay_mask(params)
