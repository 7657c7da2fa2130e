#!/usr/bin/env python
"""Microbench: strategies for the beam-search predecessor permute of a
big KV cache (the 133 ms/step whale in BENCH_FULLDECODE_r04's ablation).

The permutation only moves rows WITHIN each utterance's beam block
(predecessors = src_beam + b*K), so it can be expressed as a
block one-hot contraction that rides the MXU, or a take_along_axis
within the (B, K, ...) view, instead of an axis-0 gather.

All data is generated ON DEVICE (host RNG for 5 GB takes minutes).

Run: python tools/profiling/permute_bench.py
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


def timed(fn, make_args, iters=10, label=""):
    """fn's first arg is donated; thread the output back each call."""
    import jax

    args = list(make_args())
    out = fn(*args)
    jax.block_until_ready(out)
    args[0] = out
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args[0] = out
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {label:48s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    B, K, L, layers, H, hd = 8, 66, 257, 12, 12, 64
    n_bh = B * K
    D = H * hd
    print(
        f"LM-cache shape: {layers} layers x (k,v) x ({n_bh}, {L}, {H}, {hd}) bf16",
        flush=True,
    )
    gb = layers * 2 * n_bh * L * D * 2 / 1e9
    print(f"total {gb:.2f} GB; permute traffic (r+w) {2*gb:.2f} GB", flush=True)

    @jax.jit
    def fresh_cache(key):
        ks = jax.random.split(key, layers)
        return [
            {
                "k": jax.random.normal(k, (n_bh, L, H, hd), jnp.bfloat16),
                "v": jax.random.normal(k, (n_bh, L, H, hd), jnp.bfloat16),
            }
            for k in ks
        ]

    key = jax.random.PRNGKey(0)

    # block-structured predecessors
    rng = np.random.default_rng(0)
    src_beam = rng.integers(0, K, (B, K))
    idx = jnp.asarray(
        (src_beam + np.arange(B)[:, None] * K).reshape(-1), jnp.int32
    )
    src_beam_j = jnp.asarray(src_beam, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take0(cache, idx):
        return jax.tree_util.tree_map(lambda t: jnp.take(t, idx, axis=0), cache)

    timed(take0, lambda: [fresh_cache(key), idx], label="jnp.take axis0 (current)")

    # same gather but no donation (forces a real out-of-place copy)
    @jax.jit
    def take0_nodonate(cache, idx):
        return jax.tree_util.tree_map(lambda t: jnp.take(t, idx, axis=0), cache)

    timed(
        take0_nodonate, lambda: [fresh_cache(key), idx],
        label="take axis0, NO donation",
    )

    # the ablation's situation: the cache was last written by a jitted
    # "step" program (dynamic_update_slice + attention read), whose
    # OUTPUT layout the compiler chooses. Reproduce that producer.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def fake_step(cache, step):
        newk = jnp.ones((n_bh, 1, H, hd), jnp.bfloat16)
        out = []
        acc = jnp.zeros((n_bh, 1, H, hd), jnp.float32)
        for layer in cache:
            k = jax.lax.dynamic_update_slice_in_dim(layer["k"], newk, step, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(layer["v"], newk, step, axis=1)
            # attention-like read so the compiler sees the consumer
            kc = k.transpose(0, 2, 1, 3)
            vc = v.transpose(0, 2, 1, 3)
            q = jnp.ones((n_bh, H, 1, hd), jnp.bfloat16)
            w = jax.nn.softmax(
                (q @ kc.transpose(0, 1, 3, 2)).astype(jnp.float32), -1
            )
            acc = acc + (w.astype(jnp.bfloat16) @ vc).transpose(0, 2, 1, 3)
            out.append({"k": k, "v": v})
        return out, acc

    def stepped_cache():
        c, _ = fake_step(fresh_cache(key), jnp.int32(100))
        return c

    timed(
        take0, lambda: [stepped_cache(), idx],
        label="take axis0 on step-produced cache",
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def takealong(cache, src_beam):
        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.take_along_axis(tb, src_beam[:, :, None], axis=1)
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    timed(
        takealong, lambda: [fresh_cache(key), src_beam_j],
        label="take_along_axis within block",
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def onehot(cache, src_beam):
        P = jax.nn.one_hot(src_beam, K, dtype=jnp.bfloat16)  # (B, K, K)

        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.einsum(
                "bij,bjm->bim", P, tb,
                preferred_element_type=jnp.float32,
            ).astype(t.dtype)
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    timed(
        onehot, lambda: [fresh_cache(key), src_beam_j],
        label="block one-hot einsum (MXU)",
    )

    timed(
        onehot, lambda: [stepped_cache(), src_beam_j],
        label="one-hot einsum on step-produced cache",
    )

    timed(
        takealong, lambda: [stepped_cache(), src_beam_j],
        label="take_along on step-produced cache",
    )

    # chunk-gated one-hot permute: only chunks at/below `step` move
    S = 64
    C = (L + S - 1) // S  # 5 chunks (last ragged handled by pad view)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def onehot_gated(cache, src_beam, step):
        P = jax.nn.one_hot(src_beam, K, dtype=jnp.bfloat16)

        def perm_chunk(t):  # t: (B, K, S', rest)
            tb = t.reshape(B, K, -1)
            return jnp.einsum(
                "bij,bjm->bim", P, tb,
                preferred_element_type=jnp.float32,
            ).astype(t.dtype).reshape(t.shape)

        def perm(t):
            tb = t.reshape(B, K, L, -1)
            chunks = []
            for c in range(C):
                lo, hi = c * S, min((c + 1) * S, L)
                part = tb[:, :, lo:hi]
                chunks.append(
                    jax.lax.cond(step >= lo, perm_chunk, lambda x: x, part)
                )
            return jnp.concatenate(chunks, axis=2).reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    timed(
        onehot_gated,
        lambda: [stepped_cache(), src_beam_j, jnp.int32(100)],
        label="gated one-hot, step=100 (2/5 chunks)",
    )
    timed(
        onehot_gated,
        lambda: [stepped_cache(), src_beam_j, jnp.int32(256)],
        label="gated one-hot, step=256 (5/5 chunks)",
    )


if __name__ == "__main__":
    main()
