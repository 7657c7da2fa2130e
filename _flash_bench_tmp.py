"""Pallas flash vs XLA attention, bf16 and fp32, several seq lengths."""
import time
import jax, jax.numpy as jnp
from speechbrain_tpu.ops.attention import flash_attention

def xla_attn(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (q.shape[-1] ** 0.5)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

B, H, D = 8, 8, 64
for T in (512, 1024, 2048, 4096):
    for dtype in (jnp.bfloat16, jnp.float32):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, D), dtype)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, T, D), dtype)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, D), dtype)
        res = {}
        for name, fn in (("xla", jax.jit(xla_attn)),
                         ("flash", jax.jit(flash_attention))):
            try:
                o = fn(q, k, v); o.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(20):
                    o = fn(q, k, v)
                o.block_until_ready()
                dt = (time.perf_counter() - t0) / 20
                flops = 4 * B * H * T * T * D
                res[name] = flops / dt / 1e12
            except Exception as e:
                res[name] = f"ERR {type(e).__name__}"
        print(f"T={T} {dtype.__name__}: xla {res['xla']:.2f} TF/s, "
              f"flash {res['flash'] if isinstance(res['flash'], str) else round(res['flash'],2)} TF/s")
