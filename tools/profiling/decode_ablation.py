#!/usr/bin/env python
"""Per-component timing of ONE published-config decode step (beam=66).

Times each piece of the north-star joint CTC/attention + TransformerLM
beam-search step standalone (jitted) at serving shapes, so the 200 ms/step
wall (BENCH_FULLDECODE_r04) can be attributed:

  1. decoder decode_step          (6 layers, d=512, shared cross-KV)
  2. LM score_step                (12 layers, d=768)
  3. CTC prefix scorer score()    (T=256, n_cand=2*beam)
  4. KV-cache predecessor permute (decoder + LM caches)
  5. top_k over (B, K*V)
  6. the CTC one-hot candidate einsum alone
  7. scatter psi (n_bh, V) from (n_bh, n_cand)

Run: python tools/profiling/decode_ablation.py [--beam 66] [--batch 8]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, __file__.rsplit("/", 3)[0])

from speechbrain_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def timed(fn, *args, iters=20, label="", carry=None):
    """Time fn(*args). With ``carry=(arg_pos, out_pos)``, thread output
    ``out_pos`` back into argument ``arg_pos`` each call (donated
    buffers can't be reused)."""
    import jax

    args = list(args)
    out = fn(*args)
    if carry is not None:
        args[carry[0]] = out if carry[1] is None else out[carry[1]]
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if carry is not None:
            args[carry[0]] = out if carry[1] is None else out[carry[1]]
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {label:42s} {dt:8.2f} ms", flush=True)
    return dt, (args[carry[0]] if carry is not None else None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--beam", type=int, default=66)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--enc-t", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.ctc import CTCPrefixScore
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
        TransformerLM,
    )
    from speechbrain_tpu.nnet.linear import Linear

    B, K, T, V = args.batch, args.beam, args.enc_t, 5000
    n_bh = B * K
    n_cand = 2 * K
    max_steps = T
    L = max_steps + 1
    print(f"n_bh={n_bh} T={T} V={V} n_cand={n_cand} L={L}")

    rng = jax.random.PRNGKey(0)
    net = TransformerASR(
        tgt_vocab=V, input_size=640, d_model=512, nhead=8,
        num_encoder_layers=1, num_decoder_layers=6, d_ffn=2048,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=31, normalize_before=True,
    )
    lm = TransformerLM(
        vocab=V, d_model=768, nhead=12, num_encoder_layers=12,
        d_ffn=3072, dropout=0.0, activation="gelu", normalize_before=False,
    )
    seq_lin = Linear(n_neurons=V)

    sub = jnp.zeros((B, T, 640), jnp.bfloat16)
    tokens0 = jnp.zeros((B, 3), jnp.int32)
    v = jax.jit(net.init)(rng, sub, tokens0)
    v_lm = jax.jit(lm.init)(rng, tokens0)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    v, v_lm = cast(v), cast(v_lm)
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, 512)), jnp.bfloat16
    )
    dec0, _ = jax.jit(functools.partial(net.apply, method="decode"))(
        v, tokens0, enc
    )
    v_seq = cast(jax.jit(seq_lin.init)(rng, dec0))

    toks = jnp.zeros((n_bh,), jnp.int32)
    step = jnp.int32(100)

    # 1. decoder decode_step with shared cross KV
    cache = jax.jit(
        functools.partial(
            net.apply, method="init_decoder_cache_with_cross",
            dtype=jnp.bfloat16,
        ),
        static_argnums=(2, 3),
    )(v, enc, L, n_bh)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def dec_step(toks, cache, step):
        out, new_cache, attn = net.apply(
            v, toks, enc, cache, step, method="decode_step"
        )
        logits = seq_lin.apply(v_seq, out).astype(jnp.float32)
        return jax.nn.log_softmax(logits / 1.15, -1), new_cache, attn

    t_dec, cache = timed(dec_step, toks, cache, step, label="decoder decode_step + head", carry=(1, 1))

    # 2. LM score_step
    lm_cache = jax.jit(
        functools.partial(lm.apply, method="init_cache", dtype=jnp.bfloat16),
        static_argnums=(1, 2),
    )(v_lm, n_bh, L)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def lm_step(toks, cache, step):
        logits, new_cache = lm.apply(v_lm, toks, cache, step, method="score_step")
        return jax.nn.log_softmax(logits.astype(jnp.float32) / 1.15, -1), new_cache

    t_lm, lm_cache = timed(lm_step, toks, lm_cache, step, label="LM score_step + softmax", carry=(1, 1))

    # 3. CTC prefix scorer
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, V)), jnp.float32
    )
    x = jax.nn.log_softmax(x, -1)
    enc_lens = jnp.ones((B,))
    impl = CTCPrefixScore(x, enc_lens, 0, 2)
    state = impl.init_state(n_bh)
    is_first = jnp.zeros((n_bh,), bool)
    cands = jnp.tile(jnp.arange(n_cand, dtype=jnp.int32)[None], (n_bh, 1))

    @jax.jit
    def ctc_score(is_first, toks, cands, state):
        scores, new_states = impl.forward_step(is_first, toks, cands, state)
        return scores, new_states

    t_ctc, _ = timed(ctc_score, is_first, toks, cands, state, label="CTC prefix forward_step")

    # 3b. CTC select_state
    _, new_states = jax.jit(ctc_score)(is_first, toks, cands, state)
    hyp_idx = jnp.arange(n_bh, dtype=jnp.int32)
    cand_idx = jnp.zeros((n_bh,), jnp.int32)
    t_sel, _ = timed(
        jax.jit(impl.select_state), new_states, hyp_idx, cand_idx,
        label="CTC select_state",
    )

    # 4. cache permutes
    idx = jnp.arange(n_bh, dtype=jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_dec(cache, idx):
        return [
            {
                "self": jax.tree_util.tree_map(
                    lambda t: jnp.take(t, idx, axis=0), layer["self"]
                ),
                "cross": layer["cross"],
            }
            for layer in cache
        ]

    t_pd, cache = timed(permute_dec, cache, idx, label="decoder self-KV permute", carry=(0, None))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_lm(cache, idx):
        return jax.tree_util.tree_map(lambda t: jnp.take(t, idx, axis=0), cache)

    t_pl, lm_cache = timed(permute_lm, lm_cache, idx, label="LM KV permute", carry=(0, None))

    # --- permute strategy variants on the REAL lm cache ------------------
    src_beam = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (B, 1))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_lm_ta(cache, src_beam):
        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.take_along_axis(tb, src_beam[:, :, None], axis=1)
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    t_ta, lm_cache = timed(
        permute_lm_ta, lm_cache, src_beam,
        label="LM permute: block take_along_axis", carry=(0, None),
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_lm_oh(cache, src_beam):
        P = jax.nn.one_hot(src_beam, K, dtype=jnp.bfloat16)

        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.einsum(
                "bij,bjm->bim", P, tb,
                preferred_element_type=jnp.float32,
            ).astype(t.dtype)
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    t_oh2, lm_cache = timed(
        permute_lm_oh, lm_cache, src_beam,
        label="LM permute: block one-hot einsum", carry=(0, None),
    )

    # fused variant: permute INSIDE the same program as the LM step (the
    # real loop's situation — one fused XLA program per decode step)
    @functools.partial(jax.jit, donate_argnums=(1,))
    def lm_step_perm(toks, cache, step, src_beam):
        logits, new_cache = lm.apply(v_lm, toks, cache, step, method="score_step")
        idx = (src_beam + jnp.arange(B)[:, None] * K).reshape(-1)
        new_cache = jax.tree_util.tree_map(
            lambda t: jnp.take(t, idx, axis=0), new_cache
        )
        return jax.nn.log_softmax(logits.astype(jnp.float32) / 1.15, -1), new_cache

    t_fused, lm_cache = timed(
        lm_step_perm, toks, lm_cache, step, src_beam,
        label="LM step+take-permute FUSED", carry=(1, 1),
    )

    @functools.partial(jax.jit, donate_argnums=(1,))
    def lm_step_perm_ta(toks, cache, step, src_beam):
        logits, new_cache = lm.apply(v_lm, toks, cache, step, method="score_step")

        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.take_along_axis(tb, src_beam[:, :, None], axis=1)
            return out.reshape(t.shape)

        new_cache = jax.tree_util.tree_map(perm, new_cache)
        return jax.nn.log_softmax(logits.astype(jnp.float32) / 1.15, -1), new_cache

    t_fused_ta, lm_cache = timed(
        lm_step_perm_ta, toks, lm_cache, step, src_beam,
        label="LM step+block-ta-permute FUSED", carry=(1, 1),
    )

    # 5. top_k
    cand_scores = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, K * V)), jnp.float32
    )
    t_tk, _ = timed(
        jax.jit(lambda c: jax.lax.top_k(c, K)), cand_scores, label="top_k (B, K*V)"
    )

    # partial-scorer candidate top_k (n_bh, V) -> n_cand
    full_lp = jnp.asarray(
        np.random.default_rng(3).standard_normal((n_bh, V)), jnp.float32
    )
    t_tk2, _ = timed(
        jax.jit(lambda c: jax.lax.top_k(c, n_cand)), full_lp,
        label=f"top_k (n_bh, V) -> {n_cand}",
    )

    # 6. one-hot einsum alone
    @jax.jit
    def onehot_einsum(cands):
        cand_onehot = jax.nn.one_hot(cands, V, dtype=x.dtype)
        return jnp.einsum(
            "btv,bkcv->bktc", x,
            cand_onehot.reshape(B, K, n_cand, V),
        ).reshape(n_bh, T, n_cand)

    t_oh, _ = timed(onehot_einsum, cands, label="CTC one-hot candidate einsum")

    # 7. psi scatter back to full vocab
    psi = jnp.zeros((n_bh, n_cand))

    @jax.jit
    def scatter(psi, cands):
        psi_full = jnp.full((n_bh, V), -1e20)
        return psi_full.at[jnp.arange(n_bh)[:, None], cands].set(psi)

    t_sc, _ = timed(scatter, psi, cands, label="psi scatter to (n_bh, V)")

    total = t_dec + t_lm + t_ctc + t_sel + t_pd + t_pl + t_tk + t_tk2 + t_sc
    print(f"  {'SUM of components':42s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
