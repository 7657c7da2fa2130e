"""Whisper HF-checkpoint parity, fully offline: build a tiny random
torch WhisperForConditionalGeneration with `transformers`, save it like
an HF checkpoint directory, load it through our wrapper's from_pt
conversion path, and assert the encoder/decoder outputs match the
torch model at 1e-4 — the openai/whisper-* checkpoint path (reference
integrations/huggingface/whisper.py:665) without needing egress."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _seed_torch():
    """torch param init + randomized BN stats draw from torch's GLOBAL
    rng; seed it so the 1e-4 parity tolerance is deterministic instead
    of marginally flaky across runs."""
    torch.manual_seed(3407)
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    cfg = transformers.WhisperConfig(
        vocab_size=64,
        num_mel_bins=80,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        d_model=32,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=1500,
        max_target_positions=64,
        decoder_start_token_id=1,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    tm = transformers.WhisperForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_whisper")
    tm.save_pretrained(d, safe_serialization=False)
    transformers.WhisperFeatureExtractor().save_pretrained(d)
    return str(d), tm


def test_whisper_from_pt_checkpoint_output_parity(tiny_whisper_dir):
    src, tm = tiny_whisper_dir
    import jax.numpy as jnp

    from speechbrain_tpu.integrations.huggingface.whisper import Whisper

    whisper = Whisper(src, from_pt=True)

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    tokens = np.array([[1, 5, 9, 3]], dtype=np.int64)
    with torch.no_grad():
        tenc = tm.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()
        tlogits = tm(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    # our encoder consumes raw audio and computes mel internally; feed
    # the flax model directly to isolate the from_pt weight conversion
    jenc = np.asarray(
        whisper.model.encode(jnp.asarray(mel)).last_hidden_state
    )
    np.testing.assert_allclose(jenc, tenc, atol=1e-4, rtol=1e-4)

    jl = np.asarray(
        whisper.model(
            input_features=jnp.asarray(mel),
            decoder_input_ids=jnp.asarray(tokens.astype(np.int32)),
        ).logits
    )
    np.testing.assert_allclose(jl, tlogits, atol=1e-4, rtol=1e-4)


def test_whisper_wrapper_encode_decode_from_pt(tiny_whisper_dir):
    """The wrapper's own forward_encoder/forward_decoder surface on the
    converted checkpoint (raw wav in; mel computed internally)."""
    src, tm = tiny_whisper_dir
    import jax.numpy as jnp

    from speechbrain_tpu.integrations.huggingface.whisper import Whisper

    whisper = Whisper(src, from_pt=True)
    wav = jnp.asarray(
        np.random.default_rng(8).standard_normal((1, 16000)), jnp.float32
    )
    enc = whisper.forward_encoder(wav)
    assert enc.shape[0] == 1 and enc.shape[-1] == 32
    logits = whisper.forward_decoder(enc, jnp.ones((1, 4), jnp.int32))
    assert logits.shape == (1, 4, 64)


def test_wav2vec2_from_pt_checkpoint_output_parity(tmp_path):
    """wav2vec2 from_pt pour: torch Wav2Vec2Model checkpoint -> our
    flax wrapper, hidden states match at 1e-4 — the
    facebook/wav2vec2-* checkpoint path, offline."""
    cfg = transformers.Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        vocab_size=32,
    )
    tm = transformers.Wav2Vec2Model(cfg).eval()
    d = tmp_path / "tiny_w2v2"
    tm.save_pretrained(d, safe_serialization=False)

    import jax.numpy as jnp

    from speechbrain_tpu.integrations.huggingface.wav2vec2 import Wav2Vec2

    w2v = Wav2Vec2(str(d), from_pt=True)
    wav = np.random.default_rng(9).standard_normal((2, 3200)).astype(
        np.float32
    )
    with torch.no_grad():
        tout = tm(torch.from_numpy(wav)).last_hidden_state.numpy()
    jout = np.asarray(w2v(jnp.asarray(wav)))
    np.testing.assert_allclose(jout, tout, atol=1e-4, rtol=1e-4)
