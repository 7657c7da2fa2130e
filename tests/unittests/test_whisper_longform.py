"""WhisperASR long-form transcription (reference inference/ASR.py
:624-870): chunked segments with per-window metadata, previous-text
conditioning via <|startofprev|>, and no-speech skip thresholds — all
over a single encoder pass per window."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechbrain_tpu.inference.ASR import WhisperASR

SOT, EOS, NOTS, PREV, NOSPEECH, LANG_EN = 20, 21, 22, 23, 24, 25
UNK = 19
V = 32
PATTERN = [5, 6, EOS]


class FakeTokenizer:
    eos_token_id = EOS
    unk_token_id = UNK
    _SPECIALS = {
        "<|startoftranscript|>": SOT,
        "<|notimestamps|>": NOTS,
        "<|startofprev|>": PREV,
        "<|nospeech|>": NOSPEECH,
        "<|en|>": LANG_EN,
        "<|transcribe|>": UNK,  # unknown -> dropped from the prompt
    }

    def convert_tokens_to_ids(self, token):
        return self._SPECIALS.get(token, UNK)

    def convert_ids_to_tokens(self, i):
        inv = {v: k for k, v in self._SPECIALS.items()}
        return inv.get(i, str(i))

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids if i < 10)

    def encode(self, text, add_special_tokens=False):
        return [int(t) % 10 for t in text.split() if t.isdigit()] or [7]


class FakeWhisper:
    """Deterministic decoder: position i relative to the final prompt
    token (<|notimestamps|>) emits PATTERN[i]; the first position's
    logits carry a controllable no-speech logit."""

    def __init__(self, nospeech_logit=-10.0):
        self.tokenizer = FakeTokenizer()
        self.model = None
        self.nospeech_logit = nospeech_logit

    def forward_encoder(self, wavs):
        return jnp.zeros((np.asarray(wavs).shape[0], 4, 8))

    def forward_decoder(self, enc, tokens):
        import jax

        B, L = tokens.shape
        sot_pos = jnp.argmax(tokens == NOTS, axis=1)
        rel = jnp.clip(
            jnp.arange(L)[None, :] - sot_pos[:, None], 0, len(PATTERN) - 1
        )
        tgt = jnp.asarray(PATTERN)[rel]  # (B, L)
        logits = jnp.where(
            jax.nn.one_hot(tgt, V) > 0, 5.0, -20.0
        ).astype(jnp.float32)
        logits = logits.at[:, 0, NOSPEECH].set(self.nospeech_logit)
        return logits


def _asr(nospeech_logit=-10.0):
    return WhisperASR(hparams={
        "whisper": FakeWhisper(nospeech_logit), "language": "english",
        "sample_rate": 16000,
    })


def _write_wav(tmp_path, seconds=2.5):
    from speechbrain_tpu.dataio.dataio import write_audio

    sig = np.sin(np.arange(int(16000 * seconds)) / 50).astype(np.float32)
    path = tmp_path / "long.wav"
    write_audio(str(path), sig, 16000)
    return str(path)


def test_longform_segments_and_text(tmp_path):
    asr = _asr()
    path = _write_wav(tmp_path, seconds=2.5)
    segs = asr.transcribe_file(path, chunk_size=1)
    assert len(segs) == 3
    assert [round(s.start, 2) for s in segs] == [0.0, 1.0, 2.0]
    assert segs[-1].end == pytest.approx(2.5)
    for seg in segs:
        assert seg.words == "5 6"
        assert seg.tokens[:2] == [5, 6]
        assert seg.no_speech_prob is not None and seg.no_speech_prob < 0.5
        assert seg.avg_log_probs is not None


def test_longform_conditions_on_previous_text(tmp_path):
    asr = _asr()
    path = _write_wav(tmp_path, seconds=2.0)
    segs = list(asr.transcribe_file_streaming(
        path, chunk_size=1, condition_on_previous_text=True,
    ))
    assert segs[0].prompt == []
    # the second window is conditioned on the first window's tokens
    assert segs[1].prompt == segs[0].tokens
    # and the built searcher prompt carries <|startofprev|>
    prompt_ids = asr._prompt_ids(
        "english", None, prompt_tokens=segs[1].prompt
    )
    assert prompt_ids[0] == PREV


def test_longform_skips_no_speech_windows(tmp_path):
    asr = _asr(nospeech_logit=20.0)
    path = _write_wav(tmp_path, seconds=1.0)
    segs = asr.transcribe_file(
        path, chunk_size=1, logprob_threshold=None,
    )
    assert segs[0].no_speech_prob > 0.6
    assert segs[0].words == "" and segs[0].tokens == []
