"""Regression locks for the reference's RelPos conventions (found by
checkpoint-parity testing; see tests/integration/
test_torch_checkpoint_parity.py):

1. RelPosEncXL encodes |distance| in BOTH halves (the reference's
   pe_future reuses the past sinusoids, ref nnet/attention.py:333) —
   direction information comes from pos_bias_u/v + rel-shift, not the
   embedding sign.
2. RelPosMHAXL scales attention scores by 1/sqrt(embed_dim), NOT
   1/sqrt(head_dim) (ref nnet/attention.py:521).
"""

import numpy as np
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.attention import (
    RelPosMHAXL,
    rel_pos_encoding,
)


def test_rel_pos_encoding_is_distance_symmetric():
    T, D = 6, 8
    pe = np.asarray(rel_pos_encoding(T, D))[0]  # (2T-1, D)
    center = T - 1  # distance 0
    for k in range(1, T):
        np.testing.assert_allclose(
            pe[center - k], pe[center + k], atol=1e-6,
            err_msg=f"pe must encode |distance| (k={k})",
        )


def test_relpos_mha_scales_by_embed_dim():
    """Doubling nhead at fixed embed_dim must not change the score
    scale: with identity-ish projections the attention output only
    matches the 1/sqrt(embed_dim) convention."""
    D, H, T = 8, 2, 5
    mha = RelPosMHAXL(embed_dim=D, num_heads=H)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, T, D)), jnp.float32
    )
    v = mha.init(jax.random.PRNGKey(0), x, x, x)
    out, _ = mha.apply(v, x, x, x)

    # manual recompute with the embed_dim convention
    import math

    p = v["params"]
    hd = D // H
    q = (x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]).reshape(1, T, H, hd)
    k = (x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]).reshape(1, T, H, hd)
    val = (x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]).reshape(
        1, T, H, hd
    )
    pe = rel_pos_encoding(T, D)
    pp = (pe @ p["pos_proj"]["kernel"]).reshape(1, -1, H, hd)
    qu = (q + p["pos_bias_u"]).transpose(0, 2, 1, 3)
    qv = (q + p["pos_bias_v"]).transpose(0, 2, 1, 3)
    content = jnp.einsum("bhqd,bhkd->bhqk", qu, k.transpose(0, 2, 1, 3))
    from speechbrain_tpu.nnet.attention import _rel_shift

    pos = _rel_shift(jnp.einsum("bhqd,lhd->bhql", qv, pp[0]))
    scores = (content + pos) / math.sqrt(D)  # embed_dim, not head_dim
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", w, val).reshape(1, T, D)
    expected = ctx @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-5
    )
