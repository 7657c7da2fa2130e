"""Microbench: axis-0 row permutation strategies for beam-search caches.

Find the fastest way to reorder (n_bh, ...) cache rows by predecessor
indices on TPU. 1 GB bf16 buffer, block-diagonal permutation (within
66-beam groups), target = HBM roundtrip ~2.5 ms.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=10, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    B, K, L, H, hd = 8, 66, 257, 8, 64
    n = B * K
    D = H * hd
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.standard_normal((n, L, H, hd)), jnp.bfloat16)
    x3 = jnp.asarray(rng.standard_normal((n, L, D)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((n, L * D)), jnp.bfloat16)
    idx = jnp.asarray(
        rng.integers(0, K, (n,)) + (np.arange(n) // K) * K, jnp.int32)
    src = idx.reshape(B, K) - (jnp.arange(B) * K)[:, None]
    gb = x4.size * 2 / 1e9
    print(f"buffer {gb:.2f} GB logical", file=sys.stderr)

    t = timeit(jax.jit(lambda x, i: jnp.take(x, i, axis=0)), x4, idx)
    print(f"take_4d           {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")
    t = timeit(jax.jit(lambda x, i: jnp.take(x, i, axis=0)), x3, idx)
    print(f"take_3d           {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")
    t = timeit(jax.jit(lambda x, i: jnp.take(x, i, axis=0)), x2, idx)
    print(f"take_2d           {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")
    t = timeit(jax.jit(lambda x, i: x[i]), x2, idx)
    print(f"adv_2d            {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")

    def onehot2(x, s):
        P = jax.nn.one_hot(s, K, dtype=x.dtype)
        f = x.reshape(B, K, -1)
        return jax.lax.dot_general(
            P, f, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(x.shape)

    t = timeit(jax.jit(onehot2), x2, src)
    print(f"onehot_2d         {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")
    t = timeit(jax.jit(onehot2), x3, src)
    print(f"onehot_3d_resh    {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")

    def onehot_nores(x, s):
        P = jax.nn.one_hot(s, K, dtype=x.dtype)
        return jnp.einsum("bij,bjld->bild", P, x.reshape(B, K, L, D),
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype).reshape(x.shape)

    t = timeit(jax.jit(onehot_nores), x3, src)
    print(f"onehot_3d_einsum  {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")

    # L-axis-major variant: (L, n, D) — gather over axis 1
    xl = jnp.asarray(rng.standard_normal((L, n, D)), jnp.bfloat16)
    t = timeit(jax.jit(lambda x, i: jnp.take(x, i, axis=1)), xl, idx)
    print(f"take_Lmajor_ax1   {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")

    def onehot_lmajor(x, s):
        # (L, B, K, D) contract K with (B, K, K): j sublane-adjacent?
        P = jax.nn.one_hot(s, K, dtype=x.dtype)  # (B, K, K)
        xr = x.reshape(L, B, K, D)
        return jnp.einsum("bij,lbjd->lbid", P, xr,
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype).reshape(x.shape)

    t = timeit(jax.jit(onehot_lmajor), xl, src)
    print(f"onehot_Lmajor     {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")

    # K-second-minor variant: (B, L, K, D) — rows contiguous in tile?
    xk = jnp.asarray(rng.standard_normal((B, L, K, D)), jnp.bfloat16)

    def onehot_kminor(x, s):
        P = jax.nn.one_hot(s, K, dtype=x.dtype)  # (B, K_new, K_old)
        return jnp.einsum("bij,bljd->blid", P, x,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    t = timeit(jax.jit(onehot_kminor), xk, src)
    print(f"onehot_Kseclast   {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")

    def take_kminor(x, s):
        return jnp.take_along_axis(x, s[:, None, :, None], axis=2)

    t = timeit(jax.jit(take_kminor), xk, src)
    print(f"take_Kseclast     {t*1e3:8.2f} ms  {2*gb/t:6.0f} GB/s")


if __name__ == "__main__":
    main()
