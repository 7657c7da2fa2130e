"""Shape tests for CNNTransformerSE, TransformerST, MSTacotron2."""

import jax
import jax.numpy as jnp


def test_cnn_transformer_se_shapes():
    from speechbrain_tpu.lobes.models.transformer.TransformerSE import (
        CNNTransformerSE,
    )

    net = CNNTransformerSE(
        d_model=16, num_layers=1, nhead=4, d_ffn=32, output_size=20
    )
    x = jnp.ones((2, 10, 20))
    v = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(v, x)
    assert out.shape == (2, 10, 20)
    assert jnp.all(out >= 0)  # relu mask


def test_transformer_st_branches():
    from speechbrain_tpu.lobes.models.transformer.TransformerST import (
        TransformerST,
    )

    net = TransformerST(
        tgt_vocab=11, input_size=18, d_model=16, nhead=4,
        num_encoder_layers=1, num_decoder_layers=1, d_ffn=32,
        asr_decoder_layers=1,
    )
    src = jnp.ones((2, 12, 18))
    tgt = jnp.zeros((2, 5), jnp.int32)
    rng = jax.random.PRNGKey(0)
    v = net.init(rng, src, tgt, method="init_full")
    enc_out, dec_out = net.apply(v, src, tgt)
    assert enc_out.shape == (2, 12, 16)
    assert dec_out.shape == (2, 5, 16)

    asr_out = net.apply(v, tgt, enc_out, method="forward_asr")
    assert asr_out.shape == (2, 5, 16)

    src_tok = jnp.zeros((2, 7), jnp.int32)
    v_mt = net.init(rng, src_tok, tgt, method="forward_mt")
    mt_out = net.apply(v_mt, src_tok, tgt, method="forward_mt")
    assert mt_out.shape == (2, 5, 16)


def test_mstacotron2_speaker_conditioning():
    from speechbrain_tpu.lobes.models.MSTacotron2 import MSTacotron2

    net = MSTacotron2(
        n_symbols=20, encoder_embedding_dim=32, attention_rnn_dim=16,
        decoder_rnn_dim=16, attention_dim=16, n_mel_channels=8,
        prenet_sizes=(16, 16), postnet_embedding_dim=16, spk_emb_size=24,
    )
    text = jnp.zeros((2, 6), jnp.int32)
    text_lens = jnp.ones((2,))
    mels = jnp.ones((2, 9, 8))
    spk = jnp.ones((2, 24))
    rng = {"params": jax.random.PRNGKey(0),
           "dropout": jax.random.PRNGKey(1)}
    v = net.init(rng, text, text_lens, mels, spk)
    mel_out, mel_post, gates, aligns = net.apply(
        v, text, text_lens, mels, spk, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert mel_out.shape == (2, 9, 8)
    assert mel_post.shape == (2, 9, 8)
    assert gates.shape[:2] == (2, 9)
    assert aligns.shape == (2, 9, 6)

    # conditioning actually changes the output
    mel_out2, _, _, _ = net.apply(
        v, text, text_lens, mels, 2.0 * spk,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not jnp.allclose(mel_out, mel_out2)
