#!/usr/bin/env python
"""Microbench: strategies for the beam-search predecessor permute of a
big KV cache (the 100 ms/step whale in BENCH_FULLDECODE_r04).

The permutation only moves rows WITHIN each utterance's beam block
(predecessors = src_beam + b*K), so it can be expressed as a
block-diagonal one-hot contraction that rides the MXU instead of an
axis-0 gather.

Run: python tools/profiling/permute_bench.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, __file__.rsplit("/", 3)[0])

import functools

import numpy as np


def timed(fn, args, iters=20, label=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    args = list(args)
    args[0] = out  # thread donated buffer back
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args[0] = out
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {label:44s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    B, K, L, layers, H, hd = 8, 66, 257, 12, 12, 64
    n_bh = B * K
    D = H * hd
    print(f"LM-cache shape: {layers} layers x (k,v) x ({n_bh}, {L}, {H}, {hd}) bf16")
    gb = layers * 2 * n_bh * L * D * 2 / 1e9
    print(f"total {gb:.2f} GB; permute traffic (r+w) {2*gb:.2f} GB")

    rng = np.random.default_rng(0)

    def fresh_cache():
        return [
            {
                "k": jnp.asarray(
                    rng.standard_normal((n_bh, L, H, hd)), jnp.bfloat16
                ),
                "v": jnp.asarray(
                    rng.standard_normal((n_bh, L, H, hd)), jnp.bfloat16
                ),
            }
            for _ in range(layers)
        ]

    # block-structured predecessors
    src_beam = rng.integers(0, K, (B, K))
    idx = jnp.asarray((src_beam + np.arange(B)[:, None] * K).reshape(-1), jnp.int32)
    src_beam_j = jnp.asarray(src_beam, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take0(cache, idx):
        return jax.tree_util.tree_map(lambda t: jnp.take(t, idx, axis=0), cache)

    t_take = timed(take0, [fresh_cache(), idx], label="jnp.take axis0 (current)")

    # same op but on a cache pytree PRODUCED BY A JITTED INIT (the real
    # loop's situation: init_cache output layout is compiler-chosen)
    @functools.partial(jax.jit, static_argnums=(0, 1))
    def jit_init(n, l):
        return [
            {
                "k": jnp.zeros((n, l, H, hd), jnp.bfloat16),
                "v": jnp.zeros((n, l, H, hd), jnp.bfloat16),
            }
            for _ in range(layers)
        ]

    t_ji = timed(
        take0, [jit_init(n_bh, L), idx], label="take axis0 on jit-init cache"
    )

    # flat trailing dim (B, L, D) instead of (B, L, H, hd)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def take0f(cache, idx):
        return jax.tree_util.tree_map(lambda t: jnp.take(t, idx, axis=0), cache)

    flat = [
        {
            "k": jnp.asarray(rng.standard_normal((n_bh, L, D)), jnp.bfloat16),
            "v": jnp.asarray(rng.standard_normal((n_bh, L, D)), jnp.bfloat16),
        }
        for _ in range(layers)
    ]
    t_fl = timed(take0f, [flat, idx], label="take axis0, flat (B, L, D)")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def onehot(cache, src_beam):
        P = jax.nn.one_hot(src_beam, K, dtype=jnp.bfloat16)  # (B, K, K)

        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.einsum("bij,bjm->bim", P, tb)
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    t_oh = timed(
        onehot, [fresh_cache(), src_beam_j], label="block one-hot einsum (MXU)"
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def takealong(cache, src_beam):
        def perm(t):
            tb = t.reshape(B, K, -1)
            out = jnp.take_along_axis(tb, src_beam[:, :, None], axis=1)
            return out.reshape(t.shape)

        return jax.tree_util.tree_map(perm, cache)

    t_ta = timed(
        takealong, [fresh_cache(), src_beam_j],
        label="take_along_axis within block",
    )

    # time-major layout: (L, n_bh, H, hd), gather on axis 1
    cache_t = jax.tree_util.tree_map(
        lambda t: jnp.moveaxis(t, 0, 1).copy(), fresh_cache()
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take1(cache, idx):
        return jax.tree_util.tree_map(lambda t: jnp.take(t, idx, axis=1), cache)

    t_t1 = timed(take1, [cache_t, idx], label="time-major jnp.take axis1")

    print(
        f"\nspeedups vs take0: onehot {t_take/t_oh:.1f}x, "
        f"take_along {t_take/t_ta:.1f}x, time-major {t_take/t_t1:.1f}x"
    )


if __name__ == "__main__":
    main()
