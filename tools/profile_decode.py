"""Component-level timing of the north-star full-decode step (beam=66).

Times each sub-computation of one beam-search decode step at the exact
serving shapes (B=8, beam=66, n_bh=528, enc_T=256, V=5000).

IMPORTANT: on the axon TPU tunnel, ``block_until_ready`` does not
reliably wait for device completion, so naive timing loops report
physically impossible rates. Every measurement here CHAINS iterations
(output feeds the next input) and differences a 5-iteration chain from a
55-iteration chain, so fixed dispatch/fetch overhead cancels and the
per-iteration cost is real device time.

Usage: python tools/profile_decode.py [--beam=66] [--batch=8]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import NORTH, SR, N_MELS  # noqa: E402,F401


def _fetch(tree):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    return float(jnp.sum(leaves[0].ravel()[:1].astype(jnp.float32)))


def chain_time(fn, carry, *args, n_small=5, n_big=55):
    """Per-iteration device time of carry = fn(carry, *args)."""
    carry = fn(carry, *args)  # compile
    _fetch(carry)

    def run(c, n):
        t0 = time.perf_counter()
        for _ in range(n):
            c = fn(c, *args)
        _fetch(c)
        return time.perf_counter() - t0, c

    t1, carry = run(carry, n_small)
    t2, carry = run(carry, n_big)
    return (t2 - t1) / (n_big - n_small), carry


def main():
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.permute import gather_rows, gather_tree
    from speechbrain_tpu.decoders.scorer import CTCScorer
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
        TransformerLM,
    )
    from speechbrain_tpu.nnet.linear import Linear

    C = dict(NORTH)
    C["beam"] = 66
    for a in sys.argv:
        if a.startswith("--beam="):
            C["beam"] = int(a.split("=")[1])
        if a.startswith("--batch="):
            C["batch"] = int(a.split("=")[1])
    B, K, V = C["batch"], C["beam"], C["vocab"]
    n_bh = B * K
    enc_T = 256
    max_steps = enc_T
    L = max_steps + 1
    print(f"shapes: B={B} K={K} n_bh={n_bh} enc_T={enc_T} V={V} L={L}",
          file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    net = TransformerASR(
        tgt_vocab=V, input_size=640, d_model=C["d_model"],
        nhead=C["nhead"], num_encoder_layers=2,  # encoder unused here
        num_decoder_layers=C["dec_layers"], d_ffn=C["d_ffn"],
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=C["kernel_size"], normalize_before=True,
    )
    lm = TransformerLM(
        vocab=V, d_model=C["lm_d_model"], nhead=C["lm_nhead"],
        num_encoder_layers=C["lm_layers"], d_ffn=C["lm_d_ffn"],
        dropout=0.0, activation="gelu", normalize_before=False,
    )
    seq_lin = Linear(n_neurons=V)
    ctc_lin = Linear(n_neurons=V)

    enc = jax.random.normal(rng, (B, enc_T, C["d_model"]), jnp.bfloat16)
    sub0 = jax.random.normal(rng, (B, 8, 640), jnp.float32)
    tokens0 = jnp.zeros((B, 3), jnp.int32)
    v = jax.jit(net.init)(rng, sub0, tokens0)
    dec0, _ = jax.jit(functools.partial(net.apply, method="decode"))(
        v, tokens0, enc.astype(jnp.float32)[:, :8]
    )
    v_seq = jax.jit(seq_lin.init)(rng, dec0)
    v_ctc = jax.jit(ctc_lin.init)(rng, enc)
    v_lm = jax.jit(lm.init)(rng, tokens0)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    v, v_seq, v_ctc, v_lm = cast(v), cast(v_seq), cast(v_ctc), cast(v_lm)

    toks = jnp.zeros((n_bh,), jnp.int32)
    step = jnp.int32(37)
    preds = jnp.asarray(
        np.random.default_rng(0).integers(0, K, (n_bh,)) +
        (np.arange(n_bh) // K) * K, jnp.int32)

    # --- 1. decoder step + permute -------------------------------------
    cache = jax.jit(lambda v, e: net.apply(
        v, e, L, n_bh, method="init_decoder_cache_with_cross",
        dtype=jnp.bfloat16))(v, enc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def dec_step(cache, toks, step):
        out, new_cache, attn = net.apply(
            v, toks, enc, cache, step, method="decode_step")
        logits = seq_lin.apply(v_seq, out).astype(jnp.float32)
        del logits
        return new_cache

    t, cache = chain_time(dec_step, cache, toks, step)
    print(f"dec_step          {t*1e3:8.2f} ms")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_dec_take(cache, preds):
        return [
            {k: (vv if k == "cross" else jax.tree_util.tree_map(
                lambda t: jnp.take(t, preds, axis=0), vv))
             for k, vv in layer.items()} for layer in cache]

    t, cache = chain_time(permute_dec_take, cache, preds)
    print(f"permute_dec_take  {t*1e3:8.2f} ms")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_dec(cache, preds):
        return [
            {k: (vv if k == "cross" else jax.tree_util.tree_map(
                lambda t: gather_rows(t, preds, (B, K)), vv))
             for k, vv in layer.items()} for layer in cache]

    t, cache = chain_time(permute_dec, cache, preds)
    print(f"permute_dec_1hot  {t*1e3:8.2f} ms")
    del cache

    # --- 2. LM step + permute ------------------------------------------
    lm_cache = jax.jit(lambda v: lm.apply(
        v, n_bh, L, method="init_cache", dtype=jnp.bfloat16))(v_lm)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def lm_step(cache, toks, step):
        logits, new_cache = lm.apply(v_lm, toks, cache, step,
                                     method="score_step")
        del logits
        return new_cache

    t, lm_cache = chain_time(lm_step, lm_cache, toks, step)
    print(f"lm_step           {t*1e3:8.2f} ms")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_lm_take(cache, preds):
        return jax.tree_util.tree_map(
            lambda t: jnp.take(t, preds, axis=0), cache)

    t, lm_cache = chain_time(permute_lm_take, lm_cache, preds)
    print(f"permute_lm_take   {t*1e3:8.2f} ms")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def permute_lm(cache, preds):
        return gather_tree(cache, preds, (B, K))

    t, lm_cache = chain_time(permute_lm, lm_cache, preds)
    print(f"permute_lm_1hot   {t*1e3:8.2f} ms")
    del lm_cache

    # --- 3. CTC prefix score + select (one full scorer round) ----------
    scorer = CTCScorer(
        ctc_fn=lambda e: jax.nn.log_softmax(
            ctc_lin.apply(v_ctc, e).astype(jnp.float32), -1),
        blank_index=C["blank"], eos_index=C["eos"])
    scorer._beam_layout = (B, K)
    lens = jnp.ones((B,))
    mem0 = scorer.reset_mem(enc, lens, n_bh=n_bh)
    n_cand = int(K * 2.0)
    cands = jnp.asarray(
        np.random.default_rng(1).integers(3, V, (n_bh, n_cand)), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ctc_round(mem, toks, cands, preds):
        scores, new_states = scorer.score(toks, mem, cands, None)
        state = scorer.permute_and_select(new_states, preds, cands[:, 0])
        return state

    t, _ = chain_time(ctc_round, mem0, toks, cands, preds)
    print(f"ctc_score+select  {t*1e3:8.2f} ms   (n_cand={n_cand})")

    # --- 4. topk over beam*vocab ---------------------------------------
    cand_scores = jax.random.normal(rng, (B, K * V), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def topk(c):
        top, idx = jax.lax.top_k(c, K)
        return c + top[0, 0] * 0

    t, _ = chain_time(topk, cand_scores)
    print(f"topk_{K}x{V}      {t*1e3:8.2f} ms")

    # --- 5. full-vocab scatter of partial scores -----------------------
    psi = jax.random.normal(rng, (n_bh, n_cand), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_full(psi, cands):
        full = jnp.full((n_bh, V), -1e20)
        full = full.at[jnp.arange(n_bh)[:, None], cands].set(psi)
        return psi + full[0, 0] * 0

    t, _ = chain_time(scatter_full, psi, cands)
    print(f"scatter_psi_full  {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
