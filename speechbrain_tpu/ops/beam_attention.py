"""Ancestry beam attention: beam-search KV attention WITHOUT cache permutes.

Classic batched beam search reorders every per-hypothesis KV cache by the
predecessor index after each step — at the published beam-66 decode config
that is ~13 GB of HBM traffic per generated token across the decoder+LM
caches, and TPU row-gathers run well below HBM bandwidth (the measured
dominant cost of the whole decode, reference semantics in
``speechbrain/decoders/seq2seq.py:1586``).

This module removes the permutes entirely. Cache rows never move: at step
``s`` beam row ``h`` writes its new K/V into row ``h`` at position ``s``.
A per-hypothesis ancestry table ``anc[b, h, t]`` records which row of
utterance ``b`` holds position ``t`` of hypothesis ``h``'s history.
Maintaining it costs one tiny int32 gather per step: initialise
``anc[b, h, t] = h`` for all ``t``; after top-k selection gather rows by
the predecessor index (position ``s`` then automatically inherits the
predecessor's own row id — the row that wrote it).

Attention with the indirection is computed by a fused Pallas kernel:
flash-style accumulation over time tiles where each tile computes the
all-pairs scores ``q_h . K[j, t]`` for the utterance's ``K`` rows on the
MXU and selects ``j = anc[h, t]`` with a one-hot mask — the cache is read
exactly ONCE per step, and time tiles beyond the valid prefix are never
fetched (their block index is clamped, so the pipeline elides the DMA).

An XLA fallback (gather-then-attend) provides identical semantics on CPU
and for shapes the kernel does not support.
"""

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30

_T_TILE = 32


def ancestry_attention_reference(q, k_cache, v_cache, anc, step):
    """XLA reference/fallback implementation.

    Arguments
    ---------
    q : (B, K, H, hd) queries of the current step (one per hypothesis).
    k_cache, v_cache : (B, K, L, D) with D = H*hd; row-static KV caches.
    anc : (B, K, L) int32 ancestry table (values in [0, K)).
    step : int32 scalar; positions 0..step (inclusive) attend.

    Returns
    -------
    out : (B, K, D) attention outputs (dtype of q).
    """
    B, K, L, D = k_cache.shape
    H, hd = q.shape[2], q.shape[3]
    k_g = jnp.take_along_axis(k_cache, anc[..., None], axis=1)
    v_g = jnp.take_along_axis(v_cache, anc[..., None], axis=1)
    qh = q.astype(jnp.float32) * (1.0 / math.sqrt(hd))
    # (B, K, L, H): multiply broadcast over L, reduce hd
    scores = jnp.sum(
        qh[:, :, None] * k_g.reshape(B, K, L, H, hd).astype(jnp.float32),
        axis=-1,
    )
    valid = (jnp.arange(L) <= step)[None, None, :, None]
    scores = jnp.where(valid, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=2)
    out = jnp.sum(
        w[..., None] * v_g.reshape(B, K, L, H, hd).astype(jnp.float32),
        axis=2,
    )  # (B, K, H, hd)
    return out.reshape(B, K, D).astype(q.dtype)


def _kernel(HP, hd, n_t, t_tile):
    from jax.experimental import pallas as pl

    def kernel(step_ref, q_ref, k_ref, v_ref, anc_ref, o_ref,
               m_s, l_s, acc_s):
        # grid: (B, head_pairs, t_tiles), t innermost. Each grid step
        # handles HP heads (HP*hd = 128 lanes — the block width), so the
        # kernel body stays small (Mosaic compile time explodes on a
        # fully unrolled 12-head body) and k/v blocks fetch only the
        # 128-lane slice they use.
        #
        # orientation note: every multi-dim temp keeps the HYPOTHESIS
        # axis in lanes and (source-row, time) merged along sublanes —
        # all reshapes are sublane-major merges/splits, which Mosaic
        # lowers without relayout (lane-dim splits are rejected).
        ti = pl.program_id(2)
        step = step_ref[0]
        Kb = q_ref.shape[1]

        @pl.when(ti == 0)
        def _init():
            m_s[...] = jnp.full_like(m_s, NEG_INF)
            l_s[...] = jnp.zeros_like(l_s)
            acc_s[...] = jnp.zeros_like(acc_s)

        @pl.when(ti * t_tile <= step)
        def _tile():
            # anc arrives pre-tiled (B, n_t, Tt, K): one block per tile
            anc_t = anc_ref[0, 0]  # (Tt, K_h) int32
            tv = (
                ti * t_tile
                + jax.lax.broadcasted_iota(jnp.int32, (t_tile, Kb), 0)
            ) <= step  # (Tt, K_h)
            j_iota = jax.lax.broadcasted_iota(
                jnp.int32, (Kb, t_tile, Kb), 0
            )  # varies over source row j
            # M[j, t, h] = (anc[h, t] == j) & (t <= step)
            Mf = ((anc_t[None] == j_iota) & tv[None]).astype(jnp.float32)
            for h in range(HP):
                qh = q_ref[0, :, h * hd:(h + 1) * hd].astype(jnp.float32)
                qh = qh * (1.0 / math.sqrt(hd))
                kh = k_ref[0, :, :, h * hd:(h + 1) * hd]
                # all-pairs scores on the MXU: (K_src*Tt, K_q)
                s_all = jax.lax.dot_general(
                    kh.reshape(Kb * t_tile, hd).astype(jnp.float32), qh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(Kb, t_tile, Kb)
                # select j = anc[h, t]; invalid t -> -inf
                s_sel = jnp.sum(s_all * Mf, axis=0)  # (Tt, K_h)
                s_sel = jnp.where(tv, s_sel, NEG_INF)
                m_old = m_s[h]
                m_new = jnp.maximum(m_old, jnp.max(s_sel, axis=0))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(s_sel - m_new[None, :])  # (Tt, K_h)
                l_s[h] = l_s[h] * corr + jnp.sum(p, axis=0)
                m_s[h] = m_new
                # weighted V via the same selection mask:
                # out[h, d] = sum_{j,t} p[t,h] M[j,t,h] V[j,t,d]
                W = (p[None] * Mf).reshape(Kb * t_tile, Kb)
                vh = v_ref[0, :, :, h * hd:(h + 1) * hd]
                outp = jax.lax.dot_general(
                    W, vh.reshape(Kb * t_tile, hd).astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (K_h, hd)
                acc_s[h] = acc_s[h] * corr[:, None] + outp

        @pl.when(ti == n_t - 1)
        def _emit():
            out = acc_s[...] / l_s[...][..., :, None]  # (HP, K, hd)
            for h in range(HP):
                o_ref[0, 0, :, h * hd:(h + 1) * hd] = out[h].astype(
                    o_ref.dtype
                )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ancestry_attention_pallas(q, k_cache, v_cache, anc, step,
                               interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, L, D = k_cache.shape
    H, hd = q.shape[2], q.shape[3]
    Tt = _T_TILE
    n_t = (L + Tt - 1) // Tt
    Lp = n_t * Tt
    if Lp != L:
        # NOTE: this pad COPIES the caches — callers on the serving path
        # allocate tile-aligned buffers (init_cache rounds max_len up)
        # precisely so this branch never fires per decode step
        pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)
    # pre-tile the (tiny) ancestry table to (B, n_t, Tt, K) so each time
    # tile is a whole, alignment-clean block in (time, hyp) orientation
    if Lp != anc.shape[2]:
        anc = jnp.pad(anc, [(0, 0), (0, 0), (0, Lp - anc.shape[2])])
    anc = anc.reshape(B, K, n_t, Tt).transpose(0, 2, 3, 1)

    step_arr = jnp.full((1,), step, jnp.int32)
    # heads per grid step: enough to fill one 128-lane block (or the
    # whole width when the model is narrow) — keeps the kernel body
    # small and the block lane width tiling-legal
    if hd <= 128 and 128 % hd == 0 and H % max(1, 128 // hd) == 0:
        HP = max(1, 128 // hd)
    else:
        HP = H  # whole-width block (W == D, always legal)
    W = HP * hd
    n_hp = H // HP

    def kv_map(b, hp, t, s):
        return (b, 0, jnp.minimum(t, s[0] // Tt), hp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_hp, n_t),
        in_specs=[
            pl.BlockSpec((1, K, W), lambda b, hp, t, s: (b, 0, hp)),
            pl.BlockSpec((1, K, Tt, W), kv_map),
            pl.BlockSpec((1, K, Tt, W), kv_map),
            pl.BlockSpec((1, 1, Tt, K),
                         lambda b, hp, t, s: (b, jnp.minimum(t, s[0] // Tt),
                                              0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, K, W), lambda b, hp, t, s: (b, hp, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((HP, K), jnp.float32),       # running max
            pltpu.VMEM((HP, K), jnp.float32),       # running denom
            pltpu.VMEM((HP, K, hd), jnp.float32),   # running numerator
        ],
    )
    out = pl.pallas_call(
        _kernel(HP, hd, n_t, Tt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_hp, K, W), q.dtype),
        interpret=interpret,
    )(step_arr, q.reshape(B, K, H * hd), k_cache, v_cache,
      anc.astype(jnp.int32))
    # (B, n_hp, K, W) -> (B, K, n_hp*W = D), heads in model order
    return jnp.moveaxis(out, 1, 2).reshape(B, K, D)


def ancestry_attention(q, k_cache, v_cache, anc, step, interpret=False):
    """Beam attention through the ancestry indirection (see module doc).

    Dispatches to the fused Pallas kernel on TPU, the XLA gather+attend
    fallback elsewhere. Semantics identical to
    :func:`ancestry_attention_reference`.
    """
    use_pallas = interpret or jax.default_backend() == "tpu"
    if use_pallas:
        try:
            return _ancestry_attention_pallas(
                q, k_cache, v_cache, anc, step, interpret=interpret
            )
        except Exception:  # pragma: no cover - toolchain-dependent
            pass
    return ancestry_attention_reference(q, k_cache, v_cache, anc, step)
