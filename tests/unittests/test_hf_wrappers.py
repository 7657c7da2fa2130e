"""HF wrapper validation with tiny local configs (no network): the
Wav2Vec2 / Whisper / Llama wrappers must construct from a local config,
run forward with the documented shapes, and produce correct
trainable masks (reference integrations/huggingface/*)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")


def _write_config(tmp_path, cfg):
    d = tmp_path / "model"
    d.mkdir(exist_ok=True)
    (d / "config.json").write_text(json.dumps(cfg))
    return str(d)


def test_wav2vec2_wrapper_forward_and_masks(tmp_path):
    from speechbrain_tpu.integrations.huggingface.wav2vec2 import Wav2Vec2

    src = _write_config(tmp_path, {
        "model_type": "wav2vec2",
        "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 2, "intermediate_size": 64,
        "conv_dim": [16, 16], "conv_kernel": [10, 3],
        "conv_stride": [5, 2], "num_feat_extract_layers": 2,
        "num_conv_pos_embeddings": 16, "num_conv_pos_embedding_groups": 4,
        "do_stable_layer_norm": True, "feat_extract_norm": "layer",
        "vocab_size": 32,
    })
    w2v = Wav2Vec2(src, config_only=True, output_all_hiddens=True)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1600)), jnp.float32
    )
    feats = w2v(wav)
    assert feats.ndim == 4 and feats.shape[0] == 3  # layers+1 stacked
    assert feats.shape[1] == 2

    w2v_frozen = Wav2Vec2(src, config_only=True, freeze=True)
    mask = w2v_frozen.trainable_mask()
    assert not any(jax.tree_util.tree_leaves(mask))

    w2v_fe = Wav2Vec2(src, config_only=True,
                      freeze_feature_extractor=True)
    flat = jax.tree_util.tree_flatten_with_path(w2v_fe.trainable_mask())[0]
    fe_frozen = [
        v for path, v in flat
        if "feature_extractor" in "/".join(
            str(getattr(k, "key", k)) for k in path
        )
    ]
    rest = [
        v for path, v in flat
        if "feature_extractor" not in "/".join(
            str(getattr(k, "key", k)) for k in path
        )
    ]
    assert fe_frozen and not any(fe_frozen)
    assert rest and all(rest)


def test_whisper_wrapper_encode_decode(tmp_path):
    from speechbrain_tpu.integrations.huggingface.whisper import Whisper

    src = _write_config(tmp_path, {
        "model_type": "whisper",
        "vocab_size": 64, "d_model": 16,
        "encoder_layers": 1, "decoder_layers": 1,
        "encoder_attention_heads": 2, "decoder_attention_heads": 2,
        "encoder_ffn_dim": 32, "decoder_ffn_dim": 32,
        "num_mel_bins": 80, "max_source_positions": 16,
        "max_target_positions": 32, "decoder_start_token_id": 1,
        "eos_token_id": 2, "pad_token_id": 0,
    })
    whisper = Whisper(src, config_only=True)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3200)), jnp.float32
    )
    enc = whisper.forward_encoder(wav)
    assert enc.shape[0] == 1 and enc.shape[-1] == 16
    logits = whisper.forward_decoder(enc, jnp.ones((1, 4), jnp.int32))
    assert logits.shape == (1, 4, 64)


def test_llama_wrapper_embed_and_generate(tmp_path):
    from speechbrain_tpu.integrations.huggingface.llama import Llama

    src = _write_config(tmp_path, {
        "model_type": "llama",
        "vocab_size": 48, "hidden_size": 16,
        "intermediate_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "num_key_value_heads": 2,
        "max_position_embeddings": 64,
    })
    llama = Llama(src, config_only=True)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits = llama(ids)
    assert logits.shape == (1, 3, 48)
    emb = llama.embed_tokens(jnp.asarray([1, 2], jnp.int32))
    assert emb.shape == (2, 16)
    gen = llama.generate_greedy(ids, max_new_tokens=2)
    assert gen.shape == (1, 5)


def test_gpt_wrapper_forward(tmp_path):
    from speechbrain_tpu.integrations.huggingface.gpt import GPT

    src = _write_config(tmp_path, {
        "model_type": "gpt2",
        "vocab_size": 40, "n_positions": 32, "n_embd": 16,
        "n_layer": 1, "n_head": 2,
    })
    gpt = GPT(src, config_only=True)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = gpt(ids)
    logits = out.logits if hasattr(out, "logits") else out
    assert logits.shape == (1, 4, 40)


def test_mbart_wrapper_forward(tmp_path):
    from speechbrain_tpu.integrations.huggingface.mbart import mBART

    src = _write_config(tmp_path, {
        "model_type": "mbart",
        "vocab_size": 40, "d_model": 16,
        "encoder_layers": 1, "decoder_layers": 1,
        "encoder_attention_heads": 2, "decoder_attention_heads": 2,
        "encoder_ffn_dim": 32, "decoder_ffn_dim": 32,
        "max_position_embeddings": 64,
    })
    mbart = mBART(src, config_only=True)
    # speech-translation style: encoder takes projected speech features
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 7, 16)), jnp.float32
    )
    tokens = jnp.asarray([[2, 5, 6], [2, 7, 8]], jnp.int32)
    out = mbart(feats, tokens)
    logits = out.logits if hasattr(out, "logits") else out
    assert logits.shape == (2, 3, 40)
