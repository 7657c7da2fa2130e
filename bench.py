"""Benchmark: flagship Conformer-ASR inference pipeline on the real TPU chip.

Default prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for
the full pipeline (fbank -> stride-4 conv frontend -> 12-layer Conformer
encoder -> CTC argmax) — the `transcribe_batch` throughput north star
(BASELINE.md). ``vs_baseline`` is the speedup over THE REFERENCE ITSELF
(`/root/reference` speechbrain, torch) running the identical pipeline on
this container's CPU — the reference's actual compute substrate here.

Flags:
  --fbank    mel-frontend microbench (vs torch-CPU STFT+mel pipeline)
  --decode   encoder + on-device transformer beam search (beam=4)
  --bf16     run encoder params/activations in bfloat16
  --no-baseline  skip the torch baseline (vs_baseline = null)
"""

import functools
import json
import sys
import time

import numpy as np

SR = 16000
N_MELS = 80

# flagship config: conformer-small-ish, the recipe-accurate inference stack
ASR = dict(
    batch=16, seconds=10.0, vocab=5000, d_model=256, nhead=4, layers=12,
    d_ffn=1024, kernel_size=31,
)


def _build_jax_pipeline(bf16=False):
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.nnet.linear import Linear

    fbank = Fbank(n_mels=N_MELS)
    frontend = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(64, 32), kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    net = TransformerASR(
        tgt_vocab=ASR["vocab"], input_size=640, d_model=ASR["d_model"],
        nhead=ASR["nhead"], num_encoder_layers=ASR["layers"],
        num_decoder_layers=0, d_ffn=ASR["d_ffn"],
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=ASR["kernel_size"],
    )
    lin = Linear(n_neurons=ASR["vocab"])
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (ASR["batch"], int(SR * ASR["seconds"]))
        ),
        jnp.float32,
    )
    lens = jnp.ones((ASR["batch"],))
    feats = fbank(wavs)
    rng = jax.random.PRNGKey(0)
    v_fe = frontend.init(rng, feats, train=False)
    sub = frontend.apply(v_fe, feats, train=False)
    v = net.init(rng, sub, None)
    enc0 = net.apply(v, sub, method="encode")
    v_lin = lin.init(rng, enc0)
    if bf16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t,
        )
        v, v_lin, v_fe = cast(v), cast(v_lin), cast(v_fe)

    def encode(wavs, lens):
        from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

        feats = fbank(wavs)
        if bf16:
            feats = feats.astype(jnp.bfloat16)
        sub = frontend.apply(v_fe, feats, train=False)
        # lane-align the encoder's sequence length (measured 15% faster
        # at T=251->256 on v5e; masks track the padded frames)
        sub, lens = pad_time_to_multiple(sub, lens, multiple=128)
        return net.apply(v, sub, wav_len=lens, method="encode")

    def pipeline(wavs, lens):
        logits = lin.apply(v_lin, encode(wavs, lens))
        return jnp.argmax(logits, axis=-1)

    return pipeline, encode, (net, v, lin, v_lin), wavs, lens


def bench_asr(bf16=False):
    """Full ASR inference pipeline throughput: audio-seconds per second."""
    import jax

    pipeline, _, _, wavs, lens = _build_jax_pipeline(bf16=bf16)
    fn = jax.jit(pipeline)
    out = fn(wavs, lens)
    out.block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(wavs, lens)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return ASR["batch"] * ASR["seconds"] / dt


def bench_asr_reference_torch():
    """THE REFERENCE pipeline (same architecture/config) on torch CPU.

    Imports `/root/reference`'s speechbrain with its optional IO deps
    stubbed (they are unused on this path). Returns audio-s/s or None."""
    import types

    ref_path = "/root/reference"
    try:
        saved_modules = {}
        for name, attrs in {
            "hyperpyyaml": ["resolve_references", "load_hyperpyyaml",
                            "dump_hyperpyyaml"],
            "torchaudio": ["load", "save", "info"],
        }.items():
            if name in sys.modules:
                continue
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, lambda *x, **k: None)
            if name == "torchaudio":
                m.__version__ = "2.0.0"
                tr = types.ModuleType("torchaudio.transforms")
                m.transforms = tr
                sys.modules["torchaudio.transforms"] = tr
            sys.modules[name] = m
            saved_modules[name] = m
        sys.path.insert(0, ref_path)
        import torch
        from speechbrain.lobes.features import Fbank
        from speechbrain.lobes.models.convolution import ConvolutionFrontEnd
        from speechbrain.lobes.models.transformer.TransformerASR import (
            TransformerASR,
        )

        # smaller batch, same per-sample shapes: CPU time scales linearly
        batch, seconds = 4, ASR["seconds"]
        fbank = Fbank(n_mels=N_MELS)
        fe = ConvolutionFrontEnd(
            input_shape=(8, 10, N_MELS, 1), num_blocks=2,
            num_layers_per_block=1, out_channels=(64, 32),
            kernel_sizes=(3, 3), strides=(2, 2), residuals=(False, False),
        )
        net = TransformerASR(
            tgt_vocab=ASR["vocab"], input_size=640, d_model=ASR["d_model"],
            nhead=ASR["nhead"], num_encoder_layers=ASR["layers"],
            num_decoder_layers=0, d_ffn=ASR["d_ffn"],
            encoder_module="conformer", attention_type="RelPosMHAXL",
            kernel_size=ASR["kernel_size"], normalize_before=True,
        )
        lin = torch.nn.Linear(ASR["d_model"], ASR["vocab"])
        wavs = torch.randn(batch, int(SR * seconds))
        with torch.no_grad():
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                feats = fbank(wavs)
                sub = fe(feats.unsqueeze(-1))
                sub = sub.reshape(sub.shape[0], sub.shape[1], -1)
                enc = net.encode(sub, torch.ones(batch))
                lin(enc).argmax(-1)
                best = min(best, time.perf_counter() - t0)
        return batch * seconds / best
    except Exception as e:
        print(f"reference baseline unavailable: {e!r}", file=sys.stderr)
        return None
    finally:
        if ref_path in sys.path:
            sys.path.remove(ref_path)


def bench_decode(kv=True):
    """Encoder + on-device transformer beam search (beam=4) with a REAL
    6-layer transformer decoder: the transcribe_batch E2E path. ``kv``
    uses the KV-cached O(L)-per-step searcher (the serving path);
    kv=False re-runs the full token buffer per step for comparison."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import (
        S2SKVBeamSearcher,
        S2STransformerBeamSearcher,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.nnet.linear import Linear

    net = TransformerASR(
        tgt_vocab=ASR["vocab"], input_size=640, d_model=ASR["d_model"],
        nhead=ASR["nhead"], num_encoder_layers=ASR["layers"],
        num_decoder_layers=6, d_ffn=ASR["d_ffn"],
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=ASR["kernel_size"],
    )
    head = Linear(n_neurons=ASR["vocab"])
    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
    from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

    fbank = Fbank(n_mels=N_MELS)
    frontend = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(64, 32), kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (ASR["batch"], int(SR * ASR["seconds"]))
        ),
        jnp.float32,
    )
    lens = jnp.ones((ASR["batch"],))
    rng = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    v_fe = frontend.init(rng, feats, train=False)
    sub = frontend.apply(v_fe, feats, train=False)
    sub, lens_p = pad_time_to_multiple(sub, lens, multiple=128)
    tokens0 = jnp.zeros((ASR["batch"], 3), jnp.int32)
    v = net.init(rng, sub, tokens0)
    enc = jax.jit(
        lambda s, l: net.apply(v, s, wav_len=l, method="encode")
    )(sub, lens_p)
    dec0, _ = net.apply(v, tokens0, enc, method="decode")
    v_head = head.init(rng, dec0)
    enc.block_until_ready()
    max_len = 64

    if kv:
        def decode_step_fn(toks, cache, enc_states, enc_lens, step):
            out, new_cache, attn = net.apply(
                v, toks, enc_states, cache, step, method="decode_step"
            )
            return (
                jax.nn.log_softmax(head.apply(v_head, out), -1),
                new_cache, attn,
            )

        searcher = S2SKVBeamSearcher(
            decode_step_fn,
            lambda n, e, l: net.apply(
                v, n, max_len, method="init_decoder_cache"
            ),
            bos_index=0, eos_index=0, min_decode_ratio=0.0,
            max_decode_ratio=0.2, beam_size=4,
        )
    else:
        def decode_fn(buf, enc_states, enc_lens):
            out, attn = net.apply(v, buf, enc_states, method="decode")
            return jax.nn.log_softmax(head.apply(v_head, out), -1), attn

        searcher = S2STransformerBeamSearcher(
            decode_fn=decode_fn, max_length=max_len, bos_index=0,
            eos_index=0, min_decode_ratio=0.0, max_decode_ratio=0.2,
            beam_size=4,
        )
    searcher(enc, lens_p)  # compile + run
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        searcher(enc, lens_p)
    dt = (time.perf_counter() - t0) / iters
    return ASR["batch"] * ASR["seconds"] / dt


def bench_train(bf16=False, remat=False):
    """Flagship Conformer-CTC TRAINING step throughput (loss + grads +
    adamw update, donated buffers) in audio-seconds per second. ``remat``
    rematerializes encoder layers (less activation HBM, more FLOPs)."""
    import jax
    import jax.numpy as jnp
    import optax

    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.nnet.losses import ctc_loss
    from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

    fbank = Fbank(n_mels=N_MELS)
    frontend = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(64, 32), kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    net = TransformerASR(
        tgt_vocab=ASR["vocab"], input_size=640, d_model=ASR["d_model"],
        nhead=ASR["nhead"], num_encoder_layers=ASR["layers"],
        num_decoder_layers=0, d_ffn=ASR["d_ffn"],
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=ASR["kernel_size"], encoder_remat=remat,
    )
    head = Linear(n_neurons=ASR["vocab"])
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (ASR["batch"], int(SR * ASR["seconds"]))
        ),
        jnp.float32,
    )
    lens = jnp.ones((ASR["batch"],))
    targets = jnp.tile(
        jnp.arange(40, dtype=jnp.int32)[None] % (ASR["vocab"] - 1) + 1,
        (ASR["batch"], 1),
    )
    tgt_lens = jnp.ones((ASR["batch"],))
    rng = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    v_fe = frontend.init(rng, feats, train=False)
    sub = frontend.apply(v_fe, feats, train=False)
    v = net.init(rng, sub, None)
    v_head = head.init(rng, net.apply(v, sub, method="encode"))
    params = {
        "fe": v_fe["params"], "net": v["params"], "head": v_head["params"],
    }
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

    def loss_fn(params, wavs, lens, targets, tgt_lens):
        feats = fbank(wavs).astype(compute_dtype)
        sub = frontend.apply({"params": params["fe"]}, feats, train=False)
        sub, lens_p = pad_time_to_multiple(sub, lens, multiple=128)
        enc = net.apply(
            {"params": params["net"]}, sub, wav_len=lens_p, method="encode"
        )
        logp = jax.nn.log_softmax(
            head.apply({"params": params["head"]}, enc).astype(jnp.float32),
            axis=-1,
        )
        return ctc_loss(logp, targets, lens_p, tgt_lens, blank_index=0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, wavs, lens, targets, tgt_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, wavs, lens, targets, tgt_lens
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = train_step(
        params, opt_state, wavs, lens, targets, tgt_lens
    )
    jax.block_until_ready(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = train_step(
            params, opt_state, wavs, lens, targets, tgt_lens
        )
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return ASR["batch"] * ASR["seconds"] / dt


def bench_fbank_tpu():
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank

    batch, seconds, iters = 64, 10.0, 20
    fbank = Fbank(n_mels=N_MELS)
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, int(SR * seconds))),
        dtype=jnp.float32,
    )
    fn = jax.jit(fbank.__call__)
    out = fn(wavs)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(wavs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch * seconds / dt


def bench_fbank_torch():
    """The same mel pipeline with torch CPU ops."""
    try:
        import torch
    except ImportError:
        return None
    from speechbrain_tpu.processing.features import mel_filterbank_matrix

    batch, seconds = 64, 10.0
    mel = torch.from_numpy(
        np.asarray(mel_filterbank_matrix(N_MELS, 400, SR, 0, SR // 2))
    )
    window = torch.hamming_window(400)
    wavs = torch.randn(batch, int(SR * seconds))

    def run():
        spec = torch.stft(
            wavs, 400, 160, 400, window, center=True, pad_mode="constant",
            return_complex=True,
        )
        ps = spec.real**2 + spec.imag**2  # (B, F, T)
        fb = torch.matmul(ps.transpose(1, 2), mel)
        return 10.0 * torch.log10(torch.clamp(fb, min=1e-10))

    run()  # warmup
    iters = 5
    best = float("inf")
    for _ in range(3):  # best-of-3: CPU timings jitter with load
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        best = min(best, (time.perf_counter() - t0) / iters)
    return batch * seconds / best


def emit(metric, value, vs):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": "audio_seconds_per_second",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


def main():
    if "--fbank" in sys.argv:
        value = bench_fbank_tpu()
        baseline = bench_fbank_torch()
        emit("fbank_frontend_throughput", value,
             value / baseline if baseline else None)
        return
    if "--train" in sys.argv:
        bf16 = "--bf16" in sys.argv
        remat = "--remat" in sys.argv
        emit(
            "conformer_ctc_train_step_throughput"
            + ("_bf16" if bf16 else "") + ("_remat" if remat else ""),
            bench_train(bf16=bf16, remat=remat),
            None,
        )
        return
    if "--decode" in sys.argv:
        kv = "--no-kv" not in sys.argv
        emit(
            "conformer_asr_beam_decode_throughput"
            + ("" if kv else "_nokv"),
            bench_decode(kv=kv),
            None,
        )
        return
    bf16 = "--bf16" in sys.argv
    value = bench_asr(bf16=bf16)
    baseline = None
    if "--no-baseline" not in sys.argv:
        baseline = bench_asr_reference_torch()
    emit(
        "conformer_asr_pipeline_throughput" + ("_bf16" if bf16 else ""),
        value,
        value / baseline if baseline else None,
    )


if __name__ == "__main__":
    main()
