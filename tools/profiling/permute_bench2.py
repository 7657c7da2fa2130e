#!/usr/bin/env python
"""Follow-up to decode_ablation: WHY is the LM-cache permute 100 ms when
the same cache dense-reads at 470 GB/s? Disambiguate raw copy bandwidth
vs gather lowering vs layout (64-element minor dim) vs chunk gating, all
on a cache produced by the REAL TransformerLM score_step (same producer
as the beam loop).

Run: python tools/profiling/permute_bench2.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, __file__.rsplit("/", 3)[0])

from speechbrain_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def timed(fn, *args, iters=10, label="", carry=None):
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
    print(f"  {label:46s} {dt:8.2f} ms", flush=True)
    return dt, (args[carry[0]] if carry is not None else None)


def main():
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
        TransformerLM,
    )

    B, K, V = 8, 66, 5000
    n_bh = B * K
    L = 257
    lm = TransformerLM(
        vocab=V, d_model=768, nhead=12, num_encoder_layers=12,
        d_ffn=3072, dropout=0.0, activation="gelu", normalize_before=False,
    )
    rng = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((B, 3), jnp.int32)
    v_lm = jax.jit(lm.init)(rng, tokens0)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    v_lm = cast(v_lm)
    lm_cache = jax.jit(
        functools.partial(lm.apply, method="init_cache", dtype=jnp.bfloat16),
        static_argnums=(1, 2),
    )(v_lm, n_bh, L)
    toks = jnp.zeros((n_bh,), jnp.int32)
    step = jnp.int32(100)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def lm_step(toks, cache, step):
        logits, new_cache = lm.apply(
            v_lm, toks, cache, step, method="score_step"
        )
        return jax.nn.log_softmax(logits.astype(jnp.float32) / 1.15, -1), \
            new_cache

    _, lm_cache = timed(lm_step, toks, lm_cache, step,
                        label="LM score_step (baseline read)", carry=(1, 1))

    rngn = np.random.default_rng(0)
    src_beam = rngn.integers(0, K, (B, K))
    idx = jnp.asarray(
        (src_beam + np.arange(B)[:, None] * K).reshape(-1), jnp.int32
    )

    # 1. REAL dense copy roofline: no donation, +1 can't be elided
    @jax.jit
    def dense_copy(cache):
        return jax.tree_util.tree_map(lambda t: t + 1, cache)

    timed(dense_copy, lm_cache, label="dense r+w pass (x+1, no donation)")

    # 2. the current permute
    @functools.partial(jax.jit, donate_argnums=(0,))
    def take0(cache, idx):
        return jax.tree_util.tree_map(
            lambda t: jnp.take(t, idx, axis=0), cache
        )

    _, lm_cache = timed(take0, lm_cache, idx,
                        label="take axis0 (current)", carry=(0, None))

    # 3. flat last-dim layout: (n_bh, L, 768) — 128-elem minor tiles
    @jax.jit
    def to_flat(cache):
        return [
            {k: t.reshape(n_bh, L, -1) + 0 for k, t in layer["self"].items()}
            for layer in cache
        ]

    flat = to_flat(lm_cache)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take0_flat(cache, idx):
        return jax.tree_util.tree_map(
            lambda t: jnp.take(t, idx, axis=0), cache
        )

    _, flat = timed(take0_flat, flat, idx,
                    label="take axis0, flat (n_bh, L, 768)", carry=(0, None))

    # 4. one-hot einsum on the flat layout (MXU streams densely)
    src_beam_j = jnp.asarray(src_beam, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def onehot_flat(cache, src_beam):
        P = jax.nn.one_hot(src_beam, K, dtype=jnp.bfloat16)

        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.einsum(
                "bij,bjm->bim", P, tb,
                preferred_element_type=jnp.bfloat16,
            )
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    _, flat = timed(onehot_flat, flat, src_beam_j,
                    label="one-hot einsum, flat layout", carry=(0, None))

    # 5. chunk-gated flat take (step=100 -> 2/5 chunks move)
    S = 64
    C = (L + S - 1) // S

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take_gated(cache, idx, step):
        def perm(t):
            parts = []
            for c in range(C):
                lo, hi = c * S, min((c + 1) * S, L)
                part = t[:, lo:hi]
                parts.append(jax.lax.cond(
                    step >= lo,
                    lambda x: jnp.take(x, idx, axis=0),
                    lambda x: x,
                    part,
                ))
            return jnp.concatenate(parts, axis=1)

        return jax.tree_util.tree_map(perm, cache)

    _, flat = timed(take_gated, flat, idx, jnp.int32(100),
                    label="flat gated take, step=100", carry=(0, None))
    _, flat = timed(take_gated, flat, idx, jnp.int32(256),
                    label="flat gated take, step=256", carry=(0, None))

    # 6. gated one-hot einsum
    @functools.partial(jax.jit, donate_argnums=(0,))
    def onehot_gated(cache, src_beam, step):
        P = jax.nn.one_hot(src_beam, K, dtype=jnp.bfloat16)

        def perm(t):
            parts = []
            for c in range(C):
                lo, hi = c * S, min((c + 1) * S, L)
                part = t[:, lo:hi]

                def go(x):
                    xb = x.reshape(B, K, -1)
                    return jnp.einsum(
                        "bij,bjm->bim", P, xb,
                        preferred_element_type=jnp.bfloat16,
                    ).reshape(x.shape)

                parts.append(jax.lax.cond(step >= lo, go, lambda x: x, part))
            return jnp.concatenate(parts, axis=1)

        return jax.tree_util.tree_map(perm, cache)

    _, flat = timed(onehot_gated, flat, src_beam_j, jnp.int32(100),
                    label="flat gated one-hot, step=100", carry=(0, None))


if __name__ == "__main__":
    main()
