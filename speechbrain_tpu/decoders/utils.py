"""Decoder helpers.

Capability parity with the reference's ``speechbrain/decoders/utils.py``
(inflate_tensor :35, mask_by_condition :65, _update_mem :14).
"""

import jax.numpy as jnp


def inflate_tensor(tensor, times, dim):
    """Repeat each entry ``times`` along ``dim`` (beam inflation).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> inflate_tensor(jnp.array([[1, 2]]), 2, dim=0).tolist()
    [[1, 2], [1, 2]]
    """
    return jnp.repeat(tensor, times, axis=dim)


def mask_by_condition(tensor, cond, fill_value):
    """Where cond is False, replace by fill_value."""
    return jnp.where(cond, tensor, fill_value)


def update_mem(inp_tokens, memory):
    """Append one token column to a growing (B, t) memory."""
    if memory is None:
        return inp_tokens[:, None]
    return jnp.concatenate([memory, inp_tokens[:, None]], axis=-1)
