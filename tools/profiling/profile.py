#!/usr/bin/env python
"""Benchmark inference real-time factors across audio durations and batch
sizes (the reference's ``tools/profiling/profile.py``, re-expressed for
speechbrain_tpu): a jitted forward of the chosen pipeline is timed on
random audio for a (duration x batch) grid, reporting RTF and
throughput; optionally dumps an XLA trace for TensorBoard/Perfetto.

Run: python profile.py [--durations 1 5 10] [--batch-sizes 1 8 16]
         [--trace-dir profiler_logs]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])


def build_asr_pipeline(d_model=256, layers=12, vocab=5000):
    """Fbank -> Conformer encode -> CTC argmax (the flagship path)."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.nnet.linear import Linear

    fbank = Fbank(n_mels=80)
    net = TransformerASR(
        tgt_vocab=vocab, input_size=80, d_model=d_model, nhead=4,
        num_encoder_layers=layers, num_decoder_layers=0, d_ffn=4 * d_model,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=31,
    )
    head = Linear(n_neurons=vocab)
    rng = jax.random.PRNGKey(0)
    params = {}

    def pipeline_factory(example):
        feats = fbank(example)
        if "net" not in params:
            params["net"] = net.init(rng, feats, None)
            enc = net.apply(params["net"], feats, method="encode")
            params["head"] = head.init(rng, enc)

        @jax.jit
        def run(wavs):
            f = fbank(wavs)
            enc = net.apply(params["net"], f, method="encode")
            return jnp.argmax(head.apply(params["head"], enc), -1)

        return run

    return pipeline_factory


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--durations", type=float, nargs="+",
                    default=[1.0, 5.0, 10.0])
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--sample-rate", type=int, default=16000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace-dir", default=None,
                    help="dump an XLA trace here for TensorBoard")
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=12)
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    factory = build_asr_pipeline(args.d_model, args.layers)
    print(f"device: {jax.devices()[0]}")
    print(f"{'dur(s)':>7} {'batch':>6} {'ms/call':>9} {'RTF':>9} "
          f"{'audio-s/s':>10}")
    for dur in args.durations:
        T = int(dur * args.sample_rate)
        for bs in args.batch_sizes:
            wavs = jax.numpy.asarray(
                np.random.default_rng(0).standard_normal((bs, T)),
                jax.numpy.float32,
            )
            run = factory(wavs)
            out = run(wavs)
            out.block_until_ready()  # compile
            if args.trace_dir:
                jax.profiler.start_trace(args.trace_dir)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = run(wavs)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
            if args.trace_dir:
                jax.profiler.stop_trace()
            audio_s = bs * dur
            print(f"{dur:7.1f} {bs:6d} {1000 * dt:9.2f} "
                  f"{dt / audio_s:9.5f} {audio_s / dt:10.1f}")


if __name__ == "__main__":
    main()
