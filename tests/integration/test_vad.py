"""Integration: frame-level VAD trained on synthetic speech/silence, then
boundary post-processing recovers the speech segments (mirrors reference
tests/integration/VAD)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speechbrain_tpu.inference.VAD import VAD
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.linear import Linear

SR = 16000


def make_wavs(rng, B=8, dur_s=2.0):
    """Tone bursts on [0.5, 1.2]s over near-silence elsewhere."""
    T = int(SR * dur_s)
    wavs = rng.normal(0, 0.01, (B, T)).astype("float32")
    t = np.arange(T) / SR
    burst = (t >= 0.5) & (t < 1.2)
    for b in range(B):
        f = 200 + 50 * b
        wavs[b, burst] += 0.5 * np.sin(2 * np.pi * f * t[burst])
    labels_fn = lambda n_frames: (
        (np.arange(n_frames) * (dur_s / n_frames) >= 0.5)
        & (np.arange(n_frames) * (dur_s / n_frames) < 1.2)
    )
    return jnp.asarray(wavs), labels_fn


def test_vad_trains_and_segments(tmp_path):
    rng = np.random.default_rng(0)
    wavs, labels_fn = make_wavs(rng)
    fbank = Fbank(n_mels=20)
    feats = fbank(wavs)
    n_frames = feats.shape[1]
    labels = jnp.asarray(labels_fn(n_frames).astype("float32"))[None].repeat(
        wavs.shape[0], 0
    )

    model = Linear(n_neurons=1)
    v = model.init(jax.random.PRNGKey(0), feats)
    opt = optax.adam(5e-2)
    opt_state = opt.init(v)

    @jax.jit
    def step(v, opt_state):
        def loss_fn(p):
            logits = model.apply(p, feats)[..., 0]
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, labels)
            )

        loss, g = jax.value_and_grad(loss_fn)(v)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(v, updates), opt_state, loss

    losses = [float(step(v, opt_state)[2])]
    for _ in range(250):
        v, opt_state, loss = step(v, opt_state)
    assert float(loss) < 0.1, float(loss)

    # full VAD pipeline: posteriors -> threshold -> boundaries -> merge
    vad = VAD(
        modules={"model": model},
        params={"model": v["params"]},
        hparams={
            "compute_features": fbank,
            "sample_rate": SR,
            "time_resolution": 2.0 / n_frames,
        },
    )
    probs = vad.get_speech_prob_chunk(wavs)
    assert probs.shape == (8, n_frames, 1)
    prob_th = vad.apply_threshold(probs, activation_th=0.5,
                                  deactivation_th=0.25)
    boundaries = vad.get_boundaries(prob_th, output_value="seconds")
    # one segment per utterance, near [0.5, 1.2]
    assert boundaries.shape == (8, 2), boundaries
    assert np.abs(boundaries[:, 0] - 0.5).max() < 0.15, boundaries
    assert np.abs(boundaries[:, 1] - 1.2).max() < 0.15, boundaries

    merged = vad.merge_close_segments(
        [(0.0, 0.4), (0.5, 0.9), (0.95, 1.2)], close_th=0.07
    )
    np.testing.assert_allclose(merged, [(0.0, 0.4), (0.5, 1.2)])
    kept = vad.remove_short_segments([(0.0, 0.1), (0.5, 1.2)], len_th=0.25)
    np.testing.assert_allclose(kept, [(0.5, 1.2)])


def test_vad_utility_surface(tmp_path):
    """The reference's aux pipeline pieces (VAD.py:448-830): chunking,
    upsampling, segment extraction, boundary files."""
    import jax.numpy as jnp

    from speechbrain_tpu.dataio.dataio import write_audio

    class _Id:  # posterior stub: 1 inside [0.5s, 1.2s], else 0
        pass

    sr = 16000
    wav = np.zeros(2 * sr, np.float32)
    wav[int(0.5 * sr): int(1.2 * sr)] = np.random.default_rng(0).uniform(
        -0.5, 0.5, int(0.7 * sr)
    ).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_audio(path, wav, sr)

    vad = VAD(
        modules={"model": lambda x: x},
        hparams={"sample_rate": sr, "time_resolution": 0.01,
                 "compute_features": lambda w: w},
    )
    chunks = vad.create_chunks(jnp.asarray(wav)[None], 16000, 8000)
    assert chunks.shape == (3, 16000)

    boundaries = np.asarray([[0.5, 1.2]])
    up = vad.upsample_boundaries(boundaries, path)
    assert up.shape == (1, len(wav), 1)
    assert float(up[0, int(0.8 * sr), 0]) == 1.0
    assert float(up[0, int(0.2 * sr), 0]) == 0.0

    segs = vad.get_segments(boundaries, path, before_margin=0.0,
                            after_margin=0.0)
    assert len(segs) == 1 and abs(segs[0].shape[0] - int(0.7 * sr)) < 10

    vad_frames = np.zeros((1, 200, 1)); vad_frames[0, 50:120] = 1.0
    sig = vad.upsample_VAD(vad_frames, path, time_resolution=0.01)
    assert sig.shape == (1, len(wav), 1)

    out = tmp_path / "bounds.txt"
    lines = vad.save_boundaries(boundaries, save_path=str(out),
                                print_boundaries=False, audio_file=path)
    text = out.read_text()
    assert "SPEECH" in text and "NON_SPEECH" in text
    assert len(lines) == 3  # non-speech, speech, non-speech
