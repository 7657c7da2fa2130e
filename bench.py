"""Benchmark: mel-frontend (Fbank) throughput on the real TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md §6); the
baseline here is the same Fbank pipeline computed with torch (CPU) —
the reference's actual compute substrate in this container — so
vs_baseline = TPU speedup over the reference implementation's
throughput on the available hardware.
"""

import json
import time

import numpy as np

BATCH = 64
SECONDS = 10.0
SR = 16000
N_MELS = 80
ITERS = 20


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank

    fbank = Fbank(n_mels=N_MELS)
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, int(SR * SECONDS))),
        dtype=jnp.float32,
    )
    fn = jax.jit(fbank.__call__)
    out = fn(wavs)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(wavs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    audio_seconds = BATCH * SECONDS
    return audio_seconds / dt  # audio-seconds processed per wall-second


def bench_torch_reference():
    """The same pipeline with torch CPU ops (the reference's stack here)."""
    try:
        import torch
    except ImportError:
        return None
    from speechbrain_tpu.processing.features import mel_filterbank_matrix

    mel = torch.from_numpy(
        np.asarray(mel_filterbank_matrix(N_MELS, 400, SR, 0, SR // 2))
    )
    window = torch.hamming_window(400)
    wavs = torch.randn(BATCH, int(SR * SECONDS))

    def run():
        spec = torch.stft(
            wavs, 400, 160, 400, window, center=True, pad_mode="constant",
            return_complex=True,
        )
        ps = spec.real**2 + spec.imag**2  # (B, F, T)
        fb = torch.matmul(ps.transpose(1, 2), mel)
        out = 10.0 * torch.log10(torch.clamp(fb, min=1e-10))
        return out

    run()  # warmup
    iters = 5
    # best-of-3 trials: CPU timings jitter with background load, and an
    # inflated baseline would overstate vs_baseline
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        best = min(best, (time.perf_counter() - t0) / iters)
    return BATCH * SECONDS / best


def bench_asr(batch=16, seconds=10.0, bf16=False):
    """Full ASR inference pipeline: fbank -> Conformer encoder -> CTC
    greedy argmax, on-device. Returns audio-seconds processed per second
    (the 'transcribe_batch' throughput north star; RTF = 1/value*batch).
    With ``bf16`` the encoder params + activations run in bfloat16 (the
    MXU-native dtype); the frontend and argmax stay fp32."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import TransformerASR
    from speechbrain_tpu.nnet.linear import Linear

    from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd

    fbank = Fbank(n_mels=80)
    # stride-4 conv frontend, like the reference's conformer recipes:
    # the encoder runs at 25 Hz, not 100 Hz
    frontend = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(64, 32), kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    net = TransformerASR(
        tgt_vocab=5000, input_size=640, d_model=256, nhead=4,
        num_encoder_layers=12, num_decoder_layers=0, d_ffn=1024,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=31,
    )
    lin = Linear(n_neurons=5000)
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, int(SR * seconds))),
        jnp.float32,
    )
    lens = jnp.ones((batch,))
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

    @jax.jit
    def pipeline(wavs, lens):
        feats = fbank(wavs)
        if bf16:
            feats = feats.astype(jnp.bfloat16)
        sub = frontend.apply(v_fe, feats, train=False)
        enc = net.apply(v, sub, wav_len=lens, method="encode")
        logits = lin.apply(v_lin, enc)
        return jnp.argmax(logits, axis=-1)

    out = pipeline(wavs, lens)
    out.block_until_ready()
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = pipeline(wavs, lens)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch * seconds / dt


def main():
    import sys

    if "--asr" in sys.argv:
        bf16 = "--bf16" in sys.argv
        value = bench_asr(bf16=bf16)
        print(
            json.dumps(
                {
                    "metric": "conformer_asr_encode_throughput"
                    + ("_bf16" if bf16 else ""),
                    "value": round(value, 1),
                    "unit": "audio_seconds_per_second",
                    "vs_baseline": None,
                }
            )
        )
        return
    value = bench_tpu()
    baseline = bench_torch_reference()
    vs = value / baseline if baseline else None
    print(
        json.dumps(
            {
                "metric": "fbank_frontend_throughput",
                "value": round(value, 1),
                "unit": "audio_seconds_per_second",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
