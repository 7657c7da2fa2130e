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
  --full-decode  north star at the PUBLISHED decode config (beam=66,
                 max_decode_ratio=1.0; no CPU baseline — see main())
  --bf16     run encoder params/activations in bfloat16
  --no-baseline  skip the torch baseline (vs_baseline = null)

The north-star lines carry analytic {"mfu_encode", "mfu_decode"} fields
(model FLOPs / measured phase time / v5e bf16 peak).
"""

import functools
import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: repeat driver runs skip the multi-
# minute TPU compile of the beam-search program. The env var alone is
# ignored by the axon TPU plugin; enable_persistent_cache() goes through
# jax.config (called lazily so `python bench.py --help`-style paths
# don't import jax).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def _enable_cache():
    from speechbrain_tpu.utils.compile_cache import enable_persistent_cache

    return enable_persistent_cache()


def _progress(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

SR = 16000
N_MELS = 80

# flagship config: conformer-small-ish, the recipe-accurate inference stack
ASR = dict(
    batch=16, seconds=10.0, vocab=5000, d_model=256, nhead=4, layers=12,
    d_ffn=1024, kernel_size=31,
)

# THE NORTH STAR (BASELINE.md): asr-conformer-transformerlm-librispeech —
# conformer-large encoder-decoder + TransformerLM-fused joint CTC/attention
# beam search, i.e. the full `transcribe_batch` serving path (reference
# recipes/LibriSpeech/ASR/transformer/hparams/conformer_large.yaml:111-258).
# beam_size/max_decode_ratio are scaled down from the test config (66/1.0)
# to keep the reference-CPU baseline run bounded; BOTH sides decode with
# the identical configuration.
NORTH = dict(
    batch=8, seconds=10.0, vocab=5000, d_model=512, nhead=8,
    enc_layers=12, dec_layers=6, d_ffn=2048, kernel_size=31,
    lm_d_model=768, lm_nhead=12, lm_layers=12, lm_d_ffn=3072,
    beam=10, lm_weight=0.60, ctc_weight=0.40, temperature=1.15,
    max_decode_ratio=0.2, bos=1, eos=2, blank=0,
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


V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip

# MEASURED reference full-decode baseline (replaces round-4's
# estimate-in-a-comment): /root/reference speechbrain conformer-large +
# TransformerLM-fused joint CTC/attention S2STransformerBeamSearcher at
# the published test config (beam=66, max_decode_ratio=1.0), torch CPU
# on this container, batch 2 x 2 s utterances, best of 2 warm passes
# (measured 2026-08-19, wall 2483 s for the run; audio-s/s is
# length-normalized so the short utterances do not bias it in our
# favor). Re-measure live with `--full-decode --measure-baseline`.
FULL_DECODE_BASELINE_AUDIO_S_PER_S = 0.0077
FULL_DECODE_BASELINE_NOTE = (
    "measured 2026-08-19 on this container (torch CPU, beam 66, "
    "ratio 1.0, 2x2s, best-of-2); re-measure: --measure-baseline"
)


def _encoder_flops(C, T):
    """Analytic forward FLOPs of the conformer-large encoder on T frames
    (per utterance): per layer 2x half-FFNs + MHSA + conv module, 2
    FLOPs per MAC."""
    d, ffn, K = C["d_model"], C["d_ffn"], C["kernel_size"]
    per_layer = (
        2 * (2 * 2 * d * ffn) * T          # two macaron FFNs
        + 2 * 4 * d * d * T                # qkv + out projections
        + 2 * 2 * T * T * d                # scores + weighted sum
        + 2 * (2 * d * 2 * d) * T          # conv pw1 (GLU)
        + 2 * d * K * T                    # depthwise
        + 2 * d * d * T                    # conv pw2
    )
    return C["enc_layers"] * per_layer


def _decode_step_flops(C, enc_T, beam):
    """Analytic FLOPs of ONE fused decode step for ONE utterance:
    beam x (decoder layers (self+cross+ffn) + LM layer stack + heads)."""
    d, ffn = C["d_model"], C["d_ffn"]
    dec = C["dec_layers"] * (
        2 * 4 * d * d            # self qkv+out (one position)
        + 2 * 2 * enc_T * d      # cross attention reads
        + 2 * 2 * d * ffn        # ffn
    )
    lm = C["lm_layers"] * (
        2 * 4 * C["lm_d_model"] * C["lm_d_model"]
        + 2 * 2 * C["lm_d_model"] * C["lm_d_ffn"]
    )
    heads = 2 * d * C["vocab"] + 2 * C["lm_d_model"] * C["vocab"]
    return beam * (dec + lm + heads)


def bench_northstar(bf16=True, full_decode=False, batch=None):
    """North-star `transcribe_batch` throughput: fbank -> conv frontend ->
    conformer-large encoder -> KV-cached joint CTC/attention beam search
    with TransformerLM shallow fusion (ScorerBuilder: partial CTC prefix +
    full KV-cached LM), in bfloat16 by default. Returns (audio-s/s,
    {"mfu_encode", "mfu_decode"}). ``full_decode`` runs the PUBLISHED
    test-config decode (beam=66, max_decode_ratio=1.0, ref
    conformer_large.yaml) instead of the scaled config."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.scorer import (
        CTCScorer,
        KVTransformerLMScorer,
        ScorerBuilder,
    )
    from speechbrain_tpu.decoders.seq2seq import S2SKVBeamSearcher
    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
        TransformerLM,
    )
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

    C = dict(NORTH)
    if batch:
        C["batch"] = batch
    if full_decode:
        C["beam"], C["max_decode_ratio"] = 66, 1.0
    fbank = Fbank(n_mels=N_MELS)
    frontend = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(64, 32), kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    net = TransformerASR(
        tgt_vocab=C["vocab"], input_size=640, d_model=C["d_model"],
        nhead=C["nhead"], num_encoder_layers=C["enc_layers"],
        num_decoder_layers=C["dec_layers"], d_ffn=C["d_ffn"],
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=C["kernel_size"], normalize_before=True,
    )
    ctc_lin = Linear(n_neurons=C["vocab"])
    seq_lin = Linear(n_neurons=C["vocab"])
    lm = TransformerLM(
        vocab=C["vocab"], d_model=C["lm_d_model"], nhead=C["lm_nhead"],
        num_encoder_layers=C["lm_layers"], d_ffn=C["lm_d_ffn"],
        dropout=0.0, activation="gelu", normalize_before=False,
    )
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (C["batch"], int(SR * C["seconds"]))
        ),
        jnp.float32,
    )
    lens = jnp.ones((C["batch"],))
    rng = jax.random.PRNGKey(0)
    # jit every init/probe: eager init of conformer-large + the LM would
    # dispatch thousands of individual ops through the axon tunnel
    _progress("initializing models (jitted)...")
    # fbank stays eager here: STFT memoizes its DFT matrices on first
    # call, and a jitted first call would cache leaked tracers
    feats = fbank(wavs)
    v_fe = jax.jit(functools.partial(frontend.init, train=False))(rng, feats)
    sub = jax.jit(functools.partial(frontend.apply, train=False))(v_fe, feats)
    sub, lens_p = pad_time_to_multiple(sub, lens, multiple=128)
    tokens0 = jnp.zeros((C["batch"], 3), jnp.int32)
    v = jax.jit(net.init)(rng, sub, tokens0)
    enc0 = jax.jit(functools.partial(net.apply, method="encode"))(v, sub)
    v_ctc = jax.jit(ctc_lin.init)(rng, enc0)
    dec0, _ = jax.jit(functools.partial(net.apply, method="decode"))(
        v, tokens0, enc0
    )
    v_seq = jax.jit(seq_lin.init)(rng, dec0)
    v_lm = jax.jit(lm.init)(rng, tokens0)
    jax.block_until_ready(v_lm)
    _progress("init done")
    if bf16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t,
        )
        v, v_fe, v_ctc, v_seq, v_lm = (
            cast(v), cast(v_fe), cast(v_ctc), cast(v_seq), cast(v_lm)
        )
    enc_T = int(sub.shape[1])
    max_steps = max(1, int(enc_T * C["max_decode_ratio"]))

    def encode(wavs, lens):
        feats = fbank(wavs)
        if bf16:
            feats = feats.astype(jnp.bfloat16)
        sub = frontend.apply(v_fe, feats, train=False)
        sub, lens_p = pad_time_to_multiple(sub, lens, multiple=128)
        return net.apply(v, sub, wav_len=lens_p, method="encode"), lens_p

    def decode_step_fn(toks, cache, enc_states, enc_lens, step, anc=None):
        out, new_cache, attn = net.apply(
            v, toks, enc_states, cache, step, anc=anc, method="decode_step"
        )
        logits = seq_lin.apply(v_seq, out).astype(jnp.float32)
        # temperature on LOGITS, as the reference's forward_step does
        # (ref seq2seq.py:1933); the searcher applies none itself
        return jax.nn.log_softmax(logits / C["temperature"], -1), new_cache, attn

    scorer = ScorerBuilder(
        weights={"ctc": C["ctc_weight"], "transformerlm": C["lm_weight"]},
        full_scorers={
            "transformerlm": KVTransformerLMScorer(
                step_fn=lambda t, c, s, a=None: lm.apply(
                    v_lm, t, c, s, anc=a, method="score_step"
                ),
                init_cache_fn=lambda n, L: lm.apply(
                    v_lm, n, L, method="init_cache",
                    dtype=jnp.bfloat16 if bf16 else jnp.float32,
                ),
                max_length=max_steps + 1,
                temperature=C["temperature"],
                # ancestry beam decoding: LM cache rows never move
                ancestry=True,
            )
        },
        partial_scorers={
            "ctc": CTCScorer(
                ctc_fn=lambda enc: jax.nn.log_softmax(
                    ctc_lin.apply(v_ctc, enc).astype(jnp.float32), -1
                ),
                blank_index=C["blank"], eos_index=C["eos"],
            )
        },
    )
    searcher = S2SKVBeamSearcher(
        decode_step_fn,
        # precomputed cross-attention K/V: decode steps never re-project
        # the static encoder memory; shared_cross_kv keeps them
        # per-utterance (broadcast over beams in the attention) instead
        # of beam-replicated — at beam 66 that is ~3 GB of HBM
        lambda n, e, l: net.apply(
            v, e, max_steps + 1, n,
            method="init_decoder_cache_with_cross",
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
        ),
        shared_cross_kv=True,
        ancestry_kv=True,
        bos_index=C["bos"], eos_index=C["eos"], min_decode_ratio=0.0,
        max_decode_ratio=C["max_decode_ratio"], beam_size=C["beam"],
        using_eos_threshold=False, length_normalization=True,
        temperature=C["temperature"], scorer=scorer,
    )
    encode_j = jax.jit(encode)

    def transcribe(wavs, lens):
        enc, lens_p = encode_j(wavs, lens)
        jax.block_until_ready(enc)
        return searcher(enc, lens_p)

    _progress(f"devices: {jax.devices()}")
    _progress("compiling encoder...")
    t_c0 = time.perf_counter()
    jax.block_until_ready(encode_j(wavs, lens))
    _progress("encoder done; compiling+running beam search...")
    transcribe(wavs, lens)  # compile + run
    compile_seconds = time.perf_counter() - t_c0
    _progress(f"beam search compiled ({compile_seconds:.0f}s incl. first "
              "run; persistent cache makes repeats fast); timing...")
    # encode phase: chained-difference timing. block_until_ready does
    # NOT reliably wait on the axon tunnel (naive loops report
    # physically impossible rates), so iterations are chained through a
    # scalar dependency and a short chain is differenced from a long
    # one to cancel dispatch/fetch overhead.
    def _enc_chain(w, n):
        t0 = time.perf_counter()
        for _ in range(n):
            enc, _lp = encode_j(w, lens)
            w = w + (enc.ravel()[:1] * 0).astype(w.dtype).reshape(1, 1)
        float(jnp.sum(w.ravel()[:1]))
        return time.perf_counter() - t0

    _enc_chain(wavs, 2)
    enc_dt = (_enc_chain(wavs, 13) - _enc_chain(wavs, 3)) / 10
    # decode phase: the searcher ends in host-side gathers, which force
    # a real device sync per call — direct median-of-3 is trustworthy
    enc, lens_p = encode_j(wavs, lens)
    float(jnp.sum(enc.ravel()[:1].astype(jnp.float32)))
    dec_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        searcher(enc, lens_p)
        dec_times.append(time.perf_counter() - t0)
    dec_dt = sorted(dec_times)[1]
    dt = enc_dt + dec_dt
    # analytic MFU: model FLOPs / phase time / chip bf16 peak
    enc_flops = C["batch"] * _encoder_flops(C, enc_T)
    n_steps = max(1, int(enc_T * C["max_decode_ratio"]))
    dec_flops = (
        C["batch"] * n_steps
        * _decode_step_flops(C, enc_T, C["beam"])
    )
    mfu = {
        "mfu_encode": round(enc_flops / enc_dt / V5E_PEAK_FLOPS, 4),
        "mfu_decode": round(
            dec_flops / max(dec_dt, 1e-9) / V5E_PEAK_FLOPS, 4
        ),
        "compile_seconds": round(compile_seconds, 1),
    }
    return C["batch"] * C["seconds"] / dt, mfu


def bench_northstar_reference_torch():
    """THE REFERENCE's own `transcribe_batch` path (conformer-large +
    S2STransformerBeamSearcher with ScorerBuilder CTC+TransformerLM fusion,
    identical beam/ratio/weights) on this container's CPU — the reference's
    actual compute substrate here. One utterance (CPU time scales
    linearly in batch); returns audio-s/s or None."""
    import types

    ref_path = "/root/reference"
    try:
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
        sys.path.insert(0, ref_path)
        import torch
        from speechbrain.decoders.scorer import (
            CTCScorer,
            ScorerBuilder,
            TransformerLMScorer,
        )
        from speechbrain.decoders.seq2seq import S2STransformerBeamSearcher
        from speechbrain.lobes.features import Fbank
        from speechbrain.lobes.models.convolution import ConvolutionFrontEnd
        from speechbrain.lobes.models.transformer.TransformerASR import (
            TransformerASR,
        )
        from speechbrain.lobes.models.transformer.TransformerLM import (
            TransformerLM,
        )
        from speechbrain.nnet.linear import Linear

        C = NORTH
        batch, seconds = 2, C["seconds"]
        fbank = Fbank(n_mels=N_MELS)
        fe = ConvolutionFrontEnd(
            input_shape=(8, 10, N_MELS, 1), num_blocks=2,
            num_layers_per_block=1, out_channels=(64, 32),
            kernel_sizes=(3, 3), strides=(2, 2), residuals=(False, False),
        )
        net = TransformerASR(
            tgt_vocab=C["vocab"], input_size=640, d_model=C["d_model"],
            nhead=C["nhead"], num_encoder_layers=C["enc_layers"],
            num_decoder_layers=C["dec_layers"], d_ffn=C["d_ffn"],
            encoder_module="conformer", attention_type="RelPosMHAXL",
            kernel_size=C["kernel_size"], normalize_before=True,
            causal=False,
        )
        ctc_lin = Linear(input_size=C["d_model"], n_neurons=C["vocab"])
        seq_lin = Linear(input_size=C["d_model"], n_neurons=C["vocab"])
        lm = TransformerLM(
            vocab=C["vocab"], d_model=C["lm_d_model"], nhead=C["lm_nhead"],
            num_encoder_layers=C["lm_layers"], num_decoder_layers=0,
            d_ffn=C["lm_d_ffn"], dropout=0.0,
            activation=torch.nn.GELU, normalize_before=False,
        )
        lm.eval()
        net.eval()
        scorer = ScorerBuilder(
            full_scorers=[
                TransformerLMScorer(
                    language_model=lm, temperature=C["temperature"]
                ),
                CTCScorer(
                    eos_index=C["eos"], blank_index=C["blank"],
                    ctc_fc=ctc_lin,
                ),
            ],
            weights={
                "ctc": C["ctc_weight"], "transformerlm": C["lm_weight"]
            },
        )
        searcher = S2STransformerBeamSearcher(
            modules=[net, seq_lin],
            bos_index=C["bos"], eos_index=C["eos"], min_decode_ratio=0.0,
            max_decode_ratio=C["max_decode_ratio"], beam_size=C["beam"],
            temperature=C["temperature"], using_eos_threshold=False,
            length_normalization=True, scorer=scorer,
        )
        wavs = torch.randn(batch, int(SR * seconds))
        n_timed = 1 if C["max_decode_ratio"] >= 1.0 else 3
        with torch.no_grad():
            # one warm-up pass, then median of 3 with the raw seconds
            # recorded (round-4's best-of-2 wobbled ~60% between runs)
            feats = fbank(wavs)
            sub = fe(feats.unsqueeze(-1))
            sub = sub.reshape(sub.shape[0], sub.shape[1], -1)
            enc = net.encode(sub, torch.ones(batch))
            searcher(enc, torch.ones(batch))
            raws = []
            for _ in range(n_timed):
                t0 = time.perf_counter()
                feats = fbank(wavs)
                sub = fe(feats.unsqueeze(-1))
                sub = sub.reshape(sub.shape[0], sub.shape[1], -1)
                enc = net.encode(sub, torch.ones(batch))
                searcher(enc, torch.ones(batch))
                raws.append(round(time.perf_counter() - t0, 2))
        bench_northstar_reference_torch.raw_seconds = raws
        med = sorted(raws)[len(raws) // 2]
        return batch * seconds / med
    except Exception as e:
        print(f"reference northstar baseline unavailable: {e!r}",
              file=sys.stderr)
        return None
    finally:
        if ref_path in sys.path:
            sys.path.remove(ref_path)


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


def emit(metric, value, vs, extra=None):
    rec = {
        "metric": metric,
        "value": round(value, 1),
        "unit": "audio_seconds_per_second",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def main():
    _enable_cache()
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
    if "--ctc" in sys.argv:
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
        return
    batch = None
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    if "--full-decode" in sys.argv:
        # the PUBLISHED decode config (beam=66, ratio=1.0, ref
        # conformer_large.yaml test settings)
        value, mfu = bench_northstar(bf16=True, full_decode=True,
                                     batch=batch)
        if "--measure-baseline" in sys.argv:
            # live re-measurement: the reference needs ~40+ min of CPU
            # for one warm pass at this config, so the default uses the
            # stored measurement below
            C = NORTH
            C["beam"], C["max_decode_ratio"], C["seconds"] = 66, 1.0, 2.0
            baseline = bench_northstar_reference_torch()
        else:
            baseline = FULL_DECODE_BASELINE_AUDIO_S_PER_S
        emit(
            "northstar_full_decode_beam66_throughput_bf16",
            value,
            value / baseline if baseline else None,
            extra={**mfu, "baseline_audio_s_per_s": baseline,
                   "baseline_provenance": FULL_DECODE_BASELINE_NOTE},
        )
        return
    # default: THE NORTH STAR — conformer-large + TransformerLM-fused
    # joint CTC/attention beam `transcribe_batch`, bf16 serving default
    bf16 = "--fp32" not in sys.argv
    value, mfu = bench_northstar(bf16=bf16, batch=batch)
    baseline = None
    if "--no-baseline" not in sys.argv:
        baseline = bench_northstar_reference_torch()
        mfu = {
            **mfu,
            "baseline_audio_s_per_s": round(baseline, 3) if baseline
            else None,
            "baseline_raw_seconds": getattr(
                bench_northstar_reference_torch, "raw_seconds", None
            ),
        }
    emit(
        "northstar_lmfused_beam_transcribe_throughput"
        + ("_bf16" if bf16 else "_fp32"),
        value,
        value / baseline if baseline else None,
        extra=mfu,
    )


if __name__ == "__main__":
    main()
