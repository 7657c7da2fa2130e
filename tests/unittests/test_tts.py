"""Tests for the TTS family: Tacotron2, FastSpeech2, HiFiGAN, DiffWave."""

import jax
import jax.numpy as jnp
import numpy as np

KEY = jax.random.PRNGKey(0)


def test_tacotron2_teacher_forcing_and_loss():
    from speechbrain_tpu.lobes.models.Tacotron2 import Loss, Tacotron2

    net = Tacotron2(
        n_symbols=20, symbols_embedding_dim=16, encoder_embedding_dim=16,
        encoder_n_convolutions=1, attention_rnn_dim=16, decoder_rnn_dim=16,
        n_mel_channels=8, prenet_sizes=(16, 16), attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=11,
        postnet_embedding_dim=16, postnet_n_convolutions=2,
    )
    text = jnp.ones((2, 7), dtype=jnp.int32)
    mels = jnp.ones((2, 12, 8))
    rngs = {"params": KEY, "dropout": jax.random.PRNGKey(1)}
    v = net.init(rngs, text, jnp.ones(2), mels)
    mel_out, mel_post, gates, aligns = net.apply(
        v, text, jnp.ones(2), mels, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert mel_post.shape == (2, 12, 8)
    assert aligns.shape == (2, 12, 7)
    # alignments are a distribution over encoder steps
    assert np.allclose(np.asarray(aligns.sum(-1)), 1.0, atol=1e-4)
    gate_target = jnp.zeros((2, 12))
    loss = Loss()( (mel_out, mel_post, gates, aligns), (mels, gate_target))
    assert np.isfinite(float(loss))


def test_tacotron2_infer():
    from speechbrain_tpu.lobes.models.Tacotron2 import Tacotron2

    net = Tacotron2(
        n_symbols=20, symbols_embedding_dim=16, encoder_embedding_dim=16,
        encoder_n_convolutions=1, attention_rnn_dim=16, decoder_rnn_dim=16,
        n_mel_channels=8, prenet_sizes=(16, 16), attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=11,
        postnet_embedding_dim=16, postnet_n_convolutions=2,
    )
    text = jnp.ones((1, 5), dtype=jnp.int32)
    v = net.init(
        {"params": KEY, "dropout": KEY}, text, jnp.ones(1), jnp.ones((1, 6, 8))
    )
    mel, lengths, gates = net.apply(
        v, text, jnp.ones(1), max_steps=10,
        rngs={"dropout": KEY}, method="infer",
    )
    assert mel.shape == (1, 10, 8)


def test_length_regulate():
    from speechbrain_tpu.lobes.models.FastSpeech2 import length_regulate

    x = jnp.asarray([[[1.0], [2.0], [3.0]]])
    out, lens = length_regulate(x, jnp.asarray([[1, 3, 2]]), 8)
    assert out[0, :, 0].tolist() == [1.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0]
    assert int(lens[0]) == 6


def test_fastspeech2_forward_and_infer():
    from speechbrain_tpu.lobes.models.FastSpeech2 import (
        FastSpeech2,
        FastSpeech2Loss,
    )

    net = FastSpeech2(
        n_symbols=30, d_model=32, nhead=4, d_ffn=64, enc_layers=1,
        dec_layers=1, n_mel_channels=8, max_mel_len=32,
    )
    tokens = jnp.ones((2, 6), dtype=jnp.int32)
    durs = jnp.full((2, 6), 2)
    # pitch/energy are FRAME-level (B, T_mel), averaged over durations
    # inside forward (reference semantics)
    pitch = jnp.zeros((2, 12))
    energy = jnp.zeros((2, 12))
    v = net.init(KEY, tokens, durs, pitch, energy)
    out = net.apply(v, tokens, durs, pitch, energy)
    assert out["mel_post"].shape == (2, 32, 8)
    loss = FastSpeech2Loss()(
        out,
        {
            "mel": jnp.ones((2, 32, 8)),
            "durations": durs,
            "pitch": pitch,
            "energy": energy,
        },
    )
    assert np.isfinite(float(loss))
    mel, durations, p, e, lens = net.apply(v, tokens, method="infer")
    assert mel.shape == (2, 32, 8)


def test_hifigan_losses():
    from speechbrain_tpu.lobes.models.HifiGAN import (
        discriminator_loss,
        feature_loss,
        generator_adv_loss,
    )

    scores = [jnp.zeros((2, 4)), jnp.ones((2, 4))]
    assert float(generator_adv_loss(scores)) > 0
    assert float(discriminator_loss(scores, scores)) > 0
    feats = [[jnp.ones((2, 3))], [jnp.zeros((2, 3))]]
    assert float(feature_loss(feats, feats)) == 0.0


def test_diffwave_denoiser():
    from speechbrain_tpu.lobes.models.DiffWave import DiffWave

    net = DiffWave(residual_layers=2, residual_channels=8,
                   dilation_cycle_length=2, unconditional=True)
    x = jnp.ones((2, 256))
    t = jnp.zeros((2,), jnp.int32)
    v = net.init(KEY, x, t)
    out = net.apply(v, x, t)
    assert out.shape == (2, 256)


def test_diffwave_with_diffusion():
    from speechbrain_tpu.lobes.models.DiffWave import DiffWave
    from speechbrain_tpu.nnet.diffusion import DenoisingDiffusion

    net = DiffWave(residual_layers=1, residual_channels=8,
                   dilation_cycle_length=1, unconditional=True)
    x = jnp.ones((1, 128))
    t = jnp.zeros((1,), jnp.int32)
    v = net.init(KEY, x, t)
    dd = DenoisingDiffusion(
        model=lambda audio, step: net.apply(v, audio, step), timesteps=4
    )
    noisy, noise, ts = dd.train_sample(x, KEY)
    assert noisy.shape == x.shape
