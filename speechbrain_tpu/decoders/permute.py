"""Beam-search predecessor gathers as block-diagonal one-hot matmuls.

The beam loop permutes every per-hypothesis buffer (decoder KV, LM KV,
scorer state) by the predecessor index each step. On TPU, an axis-0
``jnp.take`` of a multi-GB cache lowers to a row-gather that runs at a
fraction of HBM bandwidth (measured ~100 GB/s on v5e — ~135 ms/step at
the published beam-66 config, the single largest cost in the whole
decode). Beam predecessors only ever permute WITHIN one utterance's
``beam_size`` rows, so the gather is a block-diagonal permutation: it
can be expressed as ``beam x beam`` one-hot matmuls that stream the
buffer through the MXU at full bandwidth (selection by 0/1 coefficients
is exact in any dtype).

Reference semantics: identical to the reference's
``torch.index_select(..., 0, predecessors)`` reorders in
``speechbrain/decoders/seq2seq.py:1586`` / ``scorer.py:1270``.
"""

import jax
import jax.numpy as jnp

# below this many elements the matmul setup outweighs the gather cost
_MIN_ELEMENTS = 1 << 16


def gather_rows(t, index, layout=None):
    """Gather rows of ``t`` along axis 0 by ``index`` (flat batch*beam
    predecessor indices).

    Arguments
    ---------
    t : array or non-array leaf (returned unchanged)
    index : (batch*beam,) int32 flat predecessor rows
    layout : (batch, beam) or None
        When given and ``t`` is a large floating-point buffer, the
        gather runs as a block-diagonal one-hot matmul on the MXU;
        otherwise falls back to ``jnp.take``.
    """
    if t is None or not hasattr(t, "ndim") or t.ndim == 0:
        return t
    if (
        layout is not None
        and t.ndim == 2
        # for ndim > 2 the (beam, rest)-flattening crosses the TPU tile
        # boundary and XLA inserts a relayout copy that costs more than
        # the gather it replaces (measured on v5e); 2-D buffers contract
        # in natural layout, so only those take the matmul path
        and jnp.issubdtype(t.dtype, jnp.floating)
        and t.shape[0] == layout[0] * layout[1]
        and layout[1] > 1
        and t.size >= _MIN_ELEMENTS
    ):
        B, K = layout
        src = index.reshape(B, K) - (
            jnp.arange(B, dtype=index.dtype) * K
        )[:, None]
        P = jax.nn.one_hot(src, K, dtype=t.dtype)  # (B, K, K)
        flat = t.reshape(B, K, -1)
        out = jax.lax.dot_general(
            P, flat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return out.astype(t.dtype).reshape(t.shape)
    return jnp.take(t, index, axis=0)


def gather_tree(tree, index, layout=None):
    """``gather_rows`` over every array leaf of a pytree."""
    return jax.tree_util.tree_map(
        lambda t: gather_rows(t, index, layout), tree
    )
