"""Tests for TTS/vocoder/G2P/encoder inference interfaces + HF wrappers,
wired with tiny random models (no network)."""

import numpy as np
import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


def _tiny_taco():
    from speechbrain_tpu.lobes.models.Tacotron2 import Tacotron2 as TacoModel

    return TacoModel(
        n_symbols=70, symbols_embedding_dim=16, encoder_embedding_dim=16,
        encoder_n_convolutions=1, attention_rnn_dim=16, decoder_rnn_dim=16,
        n_mel_channels=8, prenet_sizes=(16, 16), attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=11,
        postnet_embedding_dim=16, postnet_n_convolutions=2,
    )


def test_tts_and_vocoder_interfaces():
    from speechbrain_tpu.inference.TTS import Tacotron2
    from speechbrain_tpu.inference.vocoders import HIFIGAN
    from speechbrain_tpu.lobes.models.HifiGAN import HifiganGenerator

    taco = _tiny_taco()
    text = jnp.ones((1, 5), dtype=jnp.int32)
    v = taco.init({"params": KEY, "dropout": KEY}, text, jnp.ones(1),
                  jnp.ones((1, 6, 8)))
    tts = Tacotron2(
        modules={"model": taco},
        hparams={"sample_rate": 16000},
        params={"model": v["params"]},
        model_state={"batch_stats": {"model": v["batch_stats"]}},
    )
    mel, lengths = tts.encode_batch(["hi there"], max_decoder_steps=6)
    assert mel.shape == (1, 6, 8)

    gen = HifiganGenerator(
        in_channels=8, resblock_dilation_sizes=((1, 3),),
        resblock_kernel_sizes=(3,), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, upsample_factors=(4, 2),
    )
    vg = gen.init(KEY, mel)
    voc = HIFIGAN(
        modules={"generator": gen}, hparams={"sample_rate": 16000},
        params={"generator": vg["params"]},
    )
    wav = voc.decode_batch(mel)
    assert wav.shape == (1, 48)


def test_mstacotron2_clone_voice(tmp_path):
    """clone_voice must CONDITION synthesis on the reference audio's
    speaker embedding (ref inference/TTS.py:209-252): two different
    reference audios -> different mels for the same text; the
    unconditioned path stays available via encode_batch."""
    from speechbrain_tpu.dataio.dataio import write_audio
    from speechbrain_tpu.inference.TTS import MSTacotron2
    from speechbrain_tpu.lobes.models.MSTacotron2 import (
        MSTacotron2 as MSTacoModel,
    )

    net = MSTacoModel(
        n_symbols=70, symbols_embedding_dim=16, encoder_embedding_dim=16,
        encoder_n_convolutions=1, attention_rnn_dim=16, decoder_rnn_dim=16,
        n_mel_channels=8, prenet_sizes=(16, 16), attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=11,
        postnet_embedding_dim=16, postnet_n_convolutions=2, spk_emb_size=24,
    )
    text = jnp.ones((1, 5), dtype=jnp.int32)
    v = net.init(
        {"params": KEY, "dropout": KEY}, text, jnp.ones(1),
        jnp.ones((1, 6, 8)), jnp.ones((1, 24)),
    )
    # stub speaker encoder: embedding derived from the waveform content,
    # so distinct audios yield distinct embeddings
    spk_encoder = lambda wav: jnp.full((1, 24), jnp.mean(jnp.abs(wav)) * 10)
    tts = MSTacotron2(
        modules={"model": net},
        hparams={"sample_rate": 16000, "spk_emb_encoder": spk_encoder,
                 "spk_emb_size": 24},
        params={"model": v["params"]},
        model_state={"batch_stats": {"model": v["batch_stats"]}},
    )
    rng = np.random.default_rng(0)
    wav_a = tmp_path / "spk_a.wav"
    wav_b = tmp_path / "spk_b.wav"
    write_audio(str(wav_a), 0.05 * rng.standard_normal(1600).astype("float32"), 16000)
    write_audio(str(wav_b), 0.9 * rng.standard_normal(1600).astype("float32"), 16000)

    mel_a, len_a = tts.clone_voice("hi there", str(wav_a))
    mel_b, _ = tts.clone_voice("hi there", str(wav_b))
    assert mel_a.shape == mel_b.shape
    assert not np.allclose(np.asarray(mel_a), np.asarray(mel_b)), (
        "different reference speakers must give different mels"
    )
    # same audio -> reproducible conditioning
    mel_a2, _ = tts.clone_voice("hi there", str(wav_a))
    assert np.allclose(np.asarray(mel_a), np.asarray(mel_a2))
    # unconditioned synthesis still runs (spk_embs=None -> identity hook)
    mel_u, _ = tts.encode_batch(["hi there"], max_decoder_steps=6)
    assert mel_u.shape[0] == 1
    # random-voice sampling threads a sampled embedding through
    mel_r, _ = tts.generate_random_voice("hi there")
    assert mel_r.shape[0] == 1


def test_g2p_interface():
    from speechbrain_tpu.dataio.encoder import TextEncoder
    from speechbrain_tpu.inference.text import GraphemeToPhoneme
    from speechbrain_tpu.lobes.models.g2p.model import AttentionSeq2Seq

    g_enc = TextEncoder()
    g_enc.update_from_iterable("abcdefghij ")
    g_enc.add_unk()
    p_enc = TextEncoder()
    p_enc.update_from_iterable(["AA", "BB", "CC"])
    p_enc.insert_bos_eos(bos_index=0)
    model = AttentionSeq2Seq(
        num_graphemes=len(g_enc), num_phonemes=len(p_enc),
        emb_dim=8, enc_neurons=8, dec_neurons=8, enc_layers=1,
    )
    g = jnp.ones((1, 4), jnp.int32)
    p = jnp.ones((1, 2), jnp.int32)
    v = model.init(KEY, g, jnp.ones(1), p)
    g2p = GraphemeToPhoneme(
        modules={"model": model},
        hparams={"grapheme_encoder": g_enc, "phoneme_encoder": p_enc,
                 "sample_rate": 16000},
        params={"model": v["params"]},
    )
    phonemes = g2p("abc")
    assert isinstance(phonemes, list)


def test_hf_wrappers_config_only():
    import transformers

    import tempfile

    cfg = transformers.Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_feat_extract_layers=2, vocab_size=32,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    d = tempfile.mkdtemp()
    cfg.save_pretrained(d)
    from speechbrain_tpu.integrations.huggingface.wav2vec2 import Wav2Vec2

    w = Wav2Vec2(d, config_only=True, freeze=True)
    wav = jnp.asarray(np.random.randn(1, 1600), jnp.float32)
    feats = w(wav)
    assert feats.shape[-1] == 32
    mask = w.trainable_mask()
    leaves = jax.tree_util.tree_leaves(mask)
    assert not any(leaves)  # frozen


def test_audio_normalizer():
    from speechbrain_tpu.dataio.preprocess import AudioNormalizer

    norm = AudioNormalizer(sample_rate=8000)
    out = norm(jnp.ones((16000, 2)), 16000)
    assert out.shape == (8000,)


def test_extended_csv(tmp_path):
    from speechbrain_tpu.dataio.legacy import ExtendedCSVDataset
    from speechbrain_tpu.dataio.dataio import write_audio

    wav_path = tmp_path / "a.wav"
    write_audio(str(wav_path), np.zeros(800, np.float32), 16000)
    csv_path = tmp_path / "data.csv"
    csv_path.write_text(
        "ID,duration,wav,wav_format,wav_opts,words,words_format,words_opts\n"
        f"u1,0.05,{wav_path},wav,,hello world,string,\n"
    )
    ds = ExtendedCSVDataset(str(csv_path))
    item = ds[0]
    assert item["wav"].shape == (800,)
    assert item["words"] == ["hello", "world"]


def test_dynamic_bucketed_batch():
    from speechbrain_tpu.dataio.iterators import dynamic_bucketed_batch

    stream = ({"x": list(range(n))} for n in [5, 6, 50, 51, 7, 52])
    batches = list(
        dynamic_bucketed_batch(
            stream, len_key="x", buffersize=6,
            sampler_kwargs={"target_batch_numel": 100, "max_batch_size": 3},
        )
    )
    all_lens = sorted(len(ex["x"]) for b in batches for ex in b)
    assert all_lens == [5, 6, 7, 50, 51, 52]
