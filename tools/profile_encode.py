"""Chained-timing breakdown of the north-star encoder phase.

Times fbank / conv frontend / conformer encoder (and per-sublayer
variants) at serving shapes with the t5-vs-t55 chained-difference method
(see tools/profile_decode.py — block_until_ready does not wait on the
axon tunnel). Reports analytic MFU per stage.

Usage: python tools/profile_encode.py [--batch=8] [--fp32]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import NORTH, SR, N_MELS, V5E_PEAK_FLOPS, _encoder_flops  # noqa


def _fetch(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.ravel()[:1].astype(jnp.float32)))


def chain_time(fn, x, n_small=5, n_big=25):
    """fn must map x -> y with a way to feed y back; we perturb x by a
    scalar of y to chain the dependency."""
    import jax.numpy as jnp

    def once(x):
        y = fn(x)
        leaf = y[0] if isinstance(y, tuple) else y
        return x + (leaf.ravel()[:1] * 0).astype(x.dtype).reshape(
            (1,) * x.ndim
        )

    x = once(x)
    _fetch(x)

    def run(x, n):
        t0 = time.perf_counter()
        for _ in range(n):
            x = once(x)
        _fetch(x)
        return time.perf_counter() - t0, x

    t1, x = run(x, n_small)
    t2, x = run(x, n_big)
    return (t2 - t1) / (n_big - n_small)


def main():
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

    C = dict(NORTH)
    bf16 = "--fp32" not in sys.argv
    for a in sys.argv:
        if a.startswith("--batch="):
            C["batch"] = int(a.split("=")[1])
    B = C["batch"]
    fbank = Fbank(n_mels=N_MELS)
    frontend = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(64, 32), kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    net = TransformerASR(
        tgt_vocab=C["vocab"], input_size=640, d_model=C["d_model"],
        nhead=C["nhead"], num_encoder_layers=C["enc_layers"],
        num_decoder_layers=0, d_ffn=C["d_ffn"],
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=C["kernel_size"], normalize_before=True,
    )
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (B, int(SR * C["seconds"]))
        ),
        jnp.float32,
    )
    lens = jnp.ones((B,))
    rng = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    v_fe = jax.jit(functools.partial(frontend.init, train=False))(rng, feats)
    sub = jax.jit(functools.partial(frontend.apply, train=False))(v_fe, feats)
    sub, lens_p = pad_time_to_multiple(sub, lens, multiple=128)
    v = jax.jit(net.init)(rng, sub, None)
    if bf16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)
        v, v_fe = cast(v), cast(v_fe)
    enc_T = int(sub.shape[1])
    print(f"B={B} enc_T={enc_T} bf16={bf16}", file=sys.stderr)

    # --- stage 1: fbank ------------------------------------------------
    fb_j = jax.jit(lambda w: fbank(w).astype(
        jnp.bfloat16 if bf16 else jnp.float32))
    t_fb = chain_time(fb_j, wavs)
    print(f"fbank             {t_fb*1e3:8.2f} ms")

    # --- stage 2: conv frontend ---------------------------------------
    feats_c = fb_j(wavs)
    fe_j = jax.jit(lambda f: frontend.apply(v_fe, f, train=False))
    t_fe = chain_time(fe_j, feats_c)
    print(f"conv_frontend     {t_fe*1e3:8.2f} ms")

    # --- stage 3: conformer encoder ------------------------------------
    sub_c = sub.astype(jnp.bfloat16) if bf16 else sub
    enc_j = jax.jit(lambda s: net.apply(v, s, wav_len=lens_p,
                                        method="encode"))
    t_enc = chain_time(enc_j, sub_c)
    eflops = B * _encoder_flops(C, enc_T)
    print(f"conformer_encode  {t_enc*1e3:8.2f} ms   "
          f"mfu={eflops/t_enc/V5E_PEAK_FLOPS:.3f}")

    # --- encoder WITHOUT the attention (mask out) ---------------------
    # crude attribution: swap attention type by rebuilding
    for att, label in [("regularMHA", "encode_regMHA")]:
        net2 = TransformerASR(
            tgt_vocab=C["vocab"], input_size=640, d_model=C["d_model"],
            nhead=C["nhead"], num_encoder_layers=C["enc_layers"],
            num_decoder_layers=0, d_ffn=C["d_ffn"],
            encoder_module="conformer", attention_type=att,
            kernel_size=C["kernel_size"], normalize_before=True,
        )
        v2 = jax.jit(net2.init)(rng, sub, None)
        if bf16:
            v2 = cast(v2)
        enc2_j = jax.jit(lambda s: net2.apply(v2, s, wav_len=lens_p,
                                              method="encode"))
        t2 = chain_time(enc2_j, sub_c)
        print(f"{label:17s} {t2*1e3:8.2f} ms   "
              f"mfu={eflops/t2/V5E_PEAK_FLOPS:.3f}")

    total = t_fb + t_fe + t_enc
    print(f"TOTAL encode      {total*1e3:8.2f} ms   "
          f"({B*C['seconds']/total:.0f} audio-s/s)")


if __name__ == "__main__":
    main()
