"""Whisper fixed-buffer searchers over a tiny random FlaxWhisper
(reference decoders/seq2seq.py S2SWhisperBeamSearcher :1937 and
inference/ASR.py WhisperASR :431)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from speechbrain_tpu.decoders.seq2seq import (  # noqa: E402
    S2SWhisperBeamSearcher,
    S2SWhisperGreedySearcher,
)

EOS = 2
PROMPT = [1, 3]  # [sot, notimestamps]-style prompt


class TinyWhisper:
    """forward_decoder contract over a random tiny FlaxWhisper."""

    def __init__(self):
        cfg = transformers.WhisperConfig(
            vocab_size=32, d_model=16, encoder_layers=1, decoder_layers=1,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=32, decoder_ffn_dim=32, num_mel_bins=8,
            max_source_positions=16, max_target_positions=64,
            decoder_start_token_id=1, eos_token_id=EOS, pad_token_id=0,
        )
        self.model = transformers.FlaxWhisperForConditionalGeneration(cfg)
        self.params = self.model.params

    def encode(self, mel):
        return self.model.encode(
            input_features=mel, params=self.params
        ).last_hidden_state

    def forward_decoder(self, enc, tokens):
        return self.model.decode(
            decoder_input_ids=tokens, encoder_outputs=(enc,),
            params=self.params,
        ).logits


@pytest.fixture(scope="module")
def whisper_and_enc():
    tw = TinyWhisper()
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 32)),
                      jnp.float32)
    return tw, tw.encode(mel)


def test_whisper_greedy_searcher_runs_jitted(whisper_and_enc):
    tw, enc = whisper_and_enc
    searcher = S2SWhisperGreedySearcher(
        model=tw, prompt_ids=PROMPT, eos_index=EOS, max_gen_tokens=8,
    )
    hyps, lengths, scores, logp = searcher(enc, jnp.ones(2))
    assert len(hyps) == 2
    for h in hyps:
        assert len(h) <= 8
        assert EOS not in h
    assert np.isfinite(scores).all()


def test_whisper_beam_searcher_runs_and_beats_or_ties_greedy(whisper_and_enc):
    tw, enc = whisper_and_enc
    greedy = S2SWhisperGreedySearcher(
        model=tw, prompt_ids=PROMPT, eos_index=EOS, max_gen_tokens=8,
    )
    beam = S2SWhisperBeamSearcher(
        model=tw, prompt_ids=PROMPT, eos_index=EOS, beam_size=4,
        max_gen_tokens=8, eos_threshold=100.0,
    )
    ghyps, _, _, _ = greedy(enc, jnp.ones(2))
    bhyps, _, bscores, _ = beam(enc, jnp.ones(2))
    assert len(bhyps) == 2
    assert np.isfinite(bscores).all()


def test_whisper_suppress_ids_never_emitted(whisper_and_enc):
    tw, enc = whisper_and_enc
    # without suppression token X may appear; with suppression it cannot
    searcher = S2SWhisperGreedySearcher(
        model=tw, prompt_ids=PROMPT, eos_index=EOS, max_gen_tokens=8,
        suppress_ids=tuple(range(4, 32)),  # allow only 0..3
    )
    hyps, _, _, _ = searcher(enc, jnp.ones(2))
    for h in hyps:
        assert all(t < 4 for t in h), h


def test_whisper_buffer_includes_prompt(whisper_and_enc):
    tw, enc = whisper_and_enc
    searcher = S2SWhisperGreedySearcher(
        model=tw, prompt_ids=PROMPT, eos_index=EOS, max_gen_tokens=4,
    )
    mem = searcher.reset_mem(2, enc, jnp.ones(2))
    buf = np.asarray(mem["tokens"])
    assert buf.shape[1] == 4 + len(PROMPT)
    assert (buf[:, : len(PROMPT)] == np.asarray(PROMPT)).all()


class TinyWhisperKV(TinyWhisper):
    """Adds the KV-cache decode contract (like the Whisper wrapper)."""

    def init_decode_cache(self, batch_size, max_length, encoder_out):
        return self.model.init_cache(batch_size, max_length, (encoder_out,))

    def forward_decoder_step(self, encoder_out, tokens_t, cache, position):
        out = self.model.decode(
            decoder_input_ids=tokens_t[:, None],
            encoder_outputs=(encoder_out,),
            past_key_values=cache,
            params=self.params,
            decoder_position_ids=jnp.full(
                (tokens_t.shape[0], 1), position, jnp.int32
            ),
        )
        return out.logits[:, 0], out.past_key_values


def test_whisper_kv_cache_matches_buffer_decode():
    """The KV-cached Whisper searchers must produce the same hypotheses
    as the full-buffer path (same underlying model)."""
    tw = TinyWhisperKV()
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 32)), jnp.float32
    )
    enc = tw.encode(mel)
    common = dict(prompt_ids=PROMPT, eos_index=EOS, max_gen_tokens=8)
    buf = S2SWhisperGreedySearcher(model=tw, use_kv_cache=False, **common)
    kv = S2SWhisperGreedySearcher(model=tw, use_kv_cache=True, **common)
    h1, _, s1, _ = buf(enc, jnp.ones(2))
    h2, _, s2, _ = kv(enc, jnp.ones(2))
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)

    bbuf = S2SWhisperBeamSearcher(model=tw, beam_size=3,
                                  use_kv_cache=False, **common)
    bkv = S2SWhisperBeamSearcher(model=tw, beam_size=3,
                                 use_kv_cache=True, **common)
    h3, _, s3, _ = bbuf(enc, jnp.ones(2))
    h4, _, s4, _ = bkv(enc, jnp.ones(2))
    assert h3 == h4, (h3, h4)
    np.testing.assert_allclose(s3, s4, atol=1e-4)
