"""ASR inference interfaces.

Capability parity with the reference's ``speechbrain/inference/ASR.py``
(EncoderDecoderASR :35 with transcribe_file/encode_batch/transcribe_batch,
EncoderASR :176 CTC-only). Streaming ASR lives in streaming-capable
encoders + StreamingFeatureWrapper; the chunked interface follows in the
streaming module.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.inference.interfaces import Pretrained
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class EncoderDecoderASR(Pretrained):
    """Encoder + beam-search decoder transcription
    (reference ASR.py:35).

    Expects hparams: ``encoder`` (callable: wavs, lens -> enc_states),
    ``decoder`` (searcher: enc, lens -> hyps...), ``tokenizer`` with
    decode_ids.
    """

    HPARAMS_NEEDED = ["tokenizer"]
    MODULES_NEEDED = []

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.hparams.tokenizer

    def transcribe_file(self, path, **kwargs):
        """Transcribe one audio file (reference ASR.py:76)."""
        waveform = self.load_audio(path)
        batch = waveform[None]
        rel_length = jnp.ones(1)
        predicted_words, predicted_tokens = self.transcribe_batch(batch, rel_length)
        return predicted_words[0]

    def encode_batch(self, wavs, wav_lens):
        """Encoder forward (reference ASR.py:100)."""
        return self.hparams.encoder(wavs, wav_lens)

    def transcribe_batch(self, wavs, wav_lens):
        """Full transcription of a padded batch (reference ASR.py:132)."""
        encoder_out = self.encode_batch(wavs, wav_lens)
        hyps, _lens, _scores, _ = self.hparams.decoder(encoder_out, wav_lens)
        predicted_words = [
            self.tokenizer.decode_ids(tokens) for tokens in hyps
        ]
        return predicted_words, hyps


class EncoderASR(Pretrained):
    """CTC-only ASR: encoder + ctc decoding function
    (reference ASR.py:176)."""

    HPARAMS_NEEDED = ["tokenizer", "decoding_function"]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.hparams.tokenizer
        self.decoding_function = self.hparams.decoding_function

    def transcribe_file(self, path, **kwargs):
        waveform = self.load_audio(path)
        batch = waveform[None]
        rel_length = jnp.ones(1)
        predicted_words, predicted_tokens = self.transcribe_batch(batch, rel_length)
        return str(predicted_words[0])

    def encode_batch(self, wavs, wav_lens):
        return self.hparams.encoder(wavs, wav_lens)

    def transcribe_batch(self, wavs, wav_lens):
        encoder_out = self.encode_batch(wavs, wav_lens)
        predictions = self.decoding_function(encoder_out, wav_lens)
        is_ctc_text_encoder_tokenizer = hasattr(self.tokenizer, "decode_ndim")
        if is_ctc_text_encoder_tokenizer:
            predicted_words = [
                "".join(self.tokenizer.decode_ndim(token_seq))
                for token_seq in predictions
            ]
        else:
            predicted_words = [
                self.tokenizer.decode_ids(token_seq) for token_seq in predictions
            ]
        return predicted_words, predictions


# Whisper language-name -> token-code map (the common subset of the 99
# codes whisper's tokenizer defines; unknown names pass through as codes)
_WHISPER_LANG_CODES = {
    "english": "en", "chinese": "zh", "german": "de", "spanish": "es",
    "russian": "ru", "korean": "ko", "french": "fr", "japanese": "ja",
    "portuguese": "pt", "turkish": "tr", "polish": "pl", "catalan": "ca",
    "dutch": "nl", "arabic": "ar", "swedish": "sv", "italian": "it",
    "indonesian": "id", "hindi": "hi", "finnish": "fi", "vietnamese": "vi",
    "hebrew": "he", "ukrainian": "uk", "greek": "el", "malay": "ms",
    "czech": "cs", "romanian": "ro", "danish": "da", "hungarian": "hu",
    "tamil": "ta", "norwegian": "no", "thai": "th", "urdu": "ur",
    "croatian": "hr", "bulgarian": "bg", "lithuanian": "lt", "latin": "la",
    "maori": "mi", "malayalam": "ml", "welsh": "cy", "slovak": "sk",
    "telugu": "te", "persian": "fa", "latvian": "lv", "bengali": "bn",
    "serbian": "sr", "azerbaijani": "az", "slovenian": "sl", "kannada": "kn",
    "estonian": "et", "macedonian": "mk", "breton": "br", "basque": "eu",
    "icelandic": "is", "armenian": "hy", "nepali": "ne", "mongolian": "mn",
    "bosnian": "bs", "kazakh": "kk", "albanian": "sq", "swahili": "sw",
    "galician": "gl", "marathi": "mr", "punjabi": "pa", "sinhala": "si",
    "khmer": "km", "shona": "sn", "yoruba": "yo", "somali": "so",
    "afrikaans": "af", "occitan": "oc", "georgian": "ka", "belarusian": "be",
    "tajik": "tg", "sindhi": "sd", "gujarati": "gu", "amharic": "am",
    "yiddish": "yi", "lao": "lo", "uzbek": "uz", "faroese": "fo",
    "haitian creole": "ht", "pashto": "ps", "turkmen": "tk", "nynorsk": "nn",
    "maltese": "mt", "sanskrit": "sa", "luxembourgish": "lb", "myanmar": "my",
    "tibetan": "bo", "tagalog": "tl", "malagasy": "mg", "assamese": "as",
    "tatar": "tt", "hawaiian": "haw", "lingala": "ln", "hausa": "ha",
    "bashkir": "ba", "javanese": "jw", "sundanese": "su", "cantonese": "yue",
}


@dataclasses.dataclass
class ASRWhisperSegment:
    """One audio chunk flowing through Whisper transcription
    (reference ASR.py:392): mutated as decoding progresses."""

    start: float
    end: float
    chunk: object
    lang_id: str = None
    words: str = ""
    tokens: list = dataclasses.field(default_factory=list)
    prompt: list = dataclasses.field(default_factory=list)
    avg_log_probs: float = None
    no_speech_prob: float = None


class WhisperASR(Pretrained):
    """Whisper transcription over the Flax Whisper wrapper
    (reference WhisperASR at ASR.py:431-977).

    hparams: whisper (integrations.huggingface.whisper.Whisper),
    optionally language ("english", "french", ... or "<|en|>" codes),
    task ("transcribe"/"translate"), beam_size (0/1 = jitted greedy,
    >1 = jitted batched beam search). ``transcribe_batch(wavs,
    wav_lens)`` decodes on-device via the fixed-buffer fori_loop
    searchers (decoders/seq2seq.py S2SWhisperGreedy/BeamSearcher);
    ``transcribe_file`` chunks a long file into 30-second segments and
    returns ASRWhisperSegment records. ``detect_language`` mirrors the
    reference's first-token language id.
    """

    HPARAMS_NEEDED = ["whisper"]
    MODULES_NEEDED = []

    SAMPLE_RATE = 16000
    CHUNK_S = 30.0

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # searchers memoized per (language, task): a searcher instance
        # owns its jit cache, so rebuilding one per call would recompile
        self._searchers = {}
        self._last_scores = None

    # -- prompt / token plumbing ---------------------------------------
    def _tok(self):
        tok = self.hparams.whisper.tokenizer
        if tok is None:
            raise RuntimeError(
                "WhisperASR needs whisper.tokenizer (set tokenizer_source)"
            )
        return tok

    def _special_id(self, token):
        tid = self._tok().convert_tokens_to_ids(token)
        unk = self._tok().unk_token_id
        return None if tid is None or tid == unk else int(tid)

    def _language_token(self, language):
        if language is None:
            return None
        lang = language.strip().lower()
        if not lang.startswith("<|"):
            # map full names ("english") to codes via the generation map
            code = _WHISPER_LANG_CODES.get(lang, lang)
            lang = f"<|{code}|>"
        return self._special_id(lang)

    def _prompt_ids(self, language=None, task=None, prompt_tokens=None,
                    max_attn_tokens=448):
        """[(<|startofprev|> + clipped prompt) + sot (+lang +task)
        +notimestamps], dropping ids the tokenizer doesn't know
        (English-only checkpoints have no lang/task tokens). The prompt
        prefix follows the reference's conditioning rule (ref
        seq2seq.py:560-572): previous-text tokens clipped to
        ``max_attn_tokens // 2 - 1``."""
        ids = [self._special_id("<|startoftranscript|>")]
        lang_id = self._language_token(
            language or getattr(self.hparams, "language", None)
        )
        if lang_id is not None:
            ids.append(lang_id)
            task = task or getattr(self.hparams, "task", "transcribe")
            task_id = self._special_id(f"<|{task}|>")
            if task_id is not None:
                ids.append(task_id)
        nots = self._special_id("<|notimestamps|>")
        if nots is not None:
            ids.append(nots)
        ids = [i for i in ids if i is not None]
        if prompt_tokens:
            prev = self._special_id("<|startofprev|>")
            if prev is not None:
                clip = max_attn_tokens // 2 - 1
                ids = [prev] + [
                    int(t) for t in prompt_tokens[-clip:]
                ] + ids
        return ids

    def _suppress_ids(self):
        """Timestamp + non-speech special tokens blocked during decoding
        (the reference relies on whisper's suppress_tokens config)."""
        tok = self._tok()
        sup = []
        gen = getattr(self.hparams.whisper.model, "generation_config", None)
        for attr in ("suppress_tokens", "begin_suppress_tokens"):
            vals = getattr(gen, attr, None) if gen is not None else None
            if vals:
                sup.extend(int(v) for v in vals)
        # always suppress sot/nospeech so they can't be re-emitted
        for t in ("<|startoftranscript|>", "<|nospeech|>", "<|nocaptions|>"):
            tid = self._special_id(t)
            if tid is not None:
                sup.append(tid)
        return sorted(set(sup))

    def _make_searcher(self, language=None, task=None, prompt_tokens=None):
        from speechbrain_tpu.decoders.seq2seq import (
            S2SWhisperBeamSearcher,
            S2SWhisperGreedySearcher,
        )

        whisper = self.hparams.whisper
        prompt = self._prompt_ids(language, task,
                                  prompt_tokens=prompt_tokens)
        eos = int(self._tok().eos_token_id)
        beam_size = int(getattr(self.hparams, "beam_size", 1) or 1)
        max_gen = int(getattr(self.hparams, "max_gen_tokens", 224))
        common = dict(
            model=whisper, prompt_ids=prompt, eos_index=eos,
            suppress_ids=self._suppress_ids(), max_gen_tokens=max_gen,
        )
        if beam_size > 1:
            return S2SWhisperBeamSearcher(beam_size=beam_size, **common)
        return S2SWhisperGreedySearcher(**common)

    # -- public API -----------------------------------------------------
    def encode_batch(self, wavs, wav_lens=None):
        """Whisper encoder states for padded audio."""
        return self.hparams.whisper.forward_encoder(jnp.asarray(wavs))

    def _sot_logits(self, enc):
        """First-position decoder logits from <|startoftranscript|> over
        PRECOMPUTED encoder states — shared by language detection and
        no-speech probability so serving never re-runs the encoder."""
        sot = self._special_id("<|startoftranscript|>")
        buf = jnp.full((enc.shape[0], 1), sot, jnp.int32)
        return self.hparams.whisper.forward_decoder(enc, buf)[:, 0]

    def detect_language(self, wavs=None, enc=None):
        """Most likely language token per utterance (reference
        ASR.py:520): one decoder step from <|startoftranscript|>,
        restricted to language tokens. Returns (codes, ids). Pass
        ``enc`` to reuse already-computed encoder states."""
        tok = self._tok()
        if enc is None:
            enc = self.encode_batch(wavs)
        logits = self._sot_logits(enc)
        lang_ids = [
            self._special_id(f"<|{c}|>") for c in _WHISPER_LANG_CODES.values()
        ]
        lang_ids = jnp.asarray([i for i in lang_ids if i is not None])
        if lang_ids.size == 0:
            return ["<|en|>"] * enc.shape[0], [None] * enc.shape[0]
        lang_logits = logits[:, lang_ids]
        best = jnp.argmax(lang_logits, axis=-1)
        ids = [int(lang_ids[int(b)]) for b in np.asarray(best)]
        return [tok.convert_ids_to_tokens(i) for i in ids], ids

    def _decode_encoded(self, enc, lens, language=None, task=None,
                        prompt_tokens=None):
        """Run the jitted searcher over precomputed encoder states.
        Searchers are memoized per (language, task, prompt) — a changed
        conditioning prompt changes the decode buffer length and thus
        the compiled program."""
        tok = self._tok()
        key = (language, task,
               tuple(prompt_tokens) if prompt_tokens else None)
        if key not in self._searchers:
            self._searchers[key] = self._make_searcher(
                language, task, prompt_tokens
            )
        searcher = self._searchers[key]
        hyps, _lens, scores, _ = searcher(enc, lens)
        self._last_scores = np.asarray(scores)
        texts = [
            tok.decode(h, skip_special_tokens=True).strip() for h in hyps
        ]
        return texts, hyps

    def transcribe_batch(self, wavs, wav_lens=None, language=None,
                         task=None):
        """On-device decode; returns (texts, token id lists)."""
        enc = self.encode_batch(wavs, wav_lens)
        lens = jnp.ones((enc.shape[0],)) if wav_lens is None else jnp.asarray(
            wav_lens
        )
        return self._decode_encoded(enc, lens, language, task)

    def transcribe_file_streaming(self, path, task=None,
                                  initial_prompt=None,
                                  logprob_threshold=-1.0,
                                  no_speech_threshold=0.6,
                                  condition_on_previous_text=False,
                                  chunk_size=None, **kwargs):
        """Long-form transcription: split the file into ``chunk_size``-s
        windows and yield one :class:`ASRWhisperSegment` per window with
        the reference's semantics (ref inference/ASR.py:624-787):

        * optional ``initial_prompt`` and, with
          ``condition_on_previous_text``, the previous windows' tokens
          are fed back as a ``<|startofprev|>`` conditioning prefix;
        * windows whose no-speech probability exceeds
          ``no_speech_threshold`` are skipped (unless the decode's
          average log-prob beats ``logprob_threshold``);
        * language is detected per window when not forced.

        The encoder runs ONCE per window; language id, no-speech
        probability and the decode all reuse its output."""
        audio = np.asarray(self.load_audio(path, **{
            k: v for k, v in kwargs.items()
            if k not in ("language",)
        }))
        chunk_s = float(chunk_size or self.CHUNK_S)
        n = int(chunk_s * self.SAMPLE_RATE)
        forced_lang = kwargs.get("language") or getattr(
            self.hparams, "language", None
        )
        tok = self._tok()
        all_tokens = []
        if initial_prompt:
            all_tokens.extend(
                tok.encode(" " + initial_prompt.strip(),
                           add_special_tokens=False)
            )
        prompt_reset_since = 0
        nospeech_id = self._special_id("<|nospeech|>") or self._special_id(
            "<|nocaptions|>"
        )
        for s in range(0, max(len(audio), 1), n):
            chunk = audio[s : s + n]
            seg = ASRWhisperSegment(
                start=s / self.SAMPLE_RATE,
                end=min(s + n, len(audio)) / self.SAMPLE_RATE,
                chunk=chunk,
            )
            enc = self.encode_batch(chunk[None])
            sot_logits = self._sot_logits(enc)
            if forced_lang is None:
                try:
                    codes, _ = self.detect_language(enc=enc)
                    seg.lang_id = codes[0]
                except Exception:
                    seg.lang_id = None
            else:
                seg.lang_id = forced_lang
            if nospeech_id is not None:
                probs = jax.nn.softmax(sot_logits, axis=-1)
                seg.no_speech_prob = float(probs[0, nospeech_id])
            prompt = all_tokens[prompt_reset_since:]
            lens = jnp.ones((1,))
            texts, tokens = self._decode_encoded(
                enc, lens, seg.lang_id if forced_lang is None
                else forced_lang, task, prompt_tokens=prompt or None,
            )
            seg.prompt = prompt
            avg_lp = float(
                self._last_scores[0] / max(1, len(tokens[0]) + 1)
            )
            seg.avg_log_probs = avg_lp
            should_skip = (
                no_speech_threshold is not None
                and seg.no_speech_prob is not None
                and seg.no_speech_prob > no_speech_threshold
                and not (
                    logprob_threshold is not None
                    and avg_lp > logprob_threshold
                )
            )
            if should_skip:
                seg.words = ""
                seg.tokens = []
                yield seg
                continue
            seg.words = texts[0]
            seg.tokens = tokens[0]
            yield seg
            all_tokens.extend(tokens[0])
            if not condition_on_previous_text:
                prompt_reset_since = len(all_tokens)

    def transcribe_file(self, path, **kwargs):
        """Long-form transcription of a file into a list of
        :class:`ASRWhisperSegment` (reference ASR.py:790)."""
        return list(self.transcribe_file_streaming(path, **kwargs))


class SpeechLLMGreedySearcher:
    """Jitted greedy generation over an embeddings-prefix causal LM —
    the default ``searcher`` module for SpeechLLMASR (the TPU-native
    replacement for the reference's LLM generate loop).

    Arguments
    ---------
    llm_embeds_fn : callable (B, T, D) embeds -> (B, T, V) logits.
    embed_fn : callable (B,) int32 token ids -> (B, D) embeddings.
    eos_index : int
    max_new_tokens : int
    """

    def __init__(self, llm_embeds_fn, embed_fn, eos_index,
                 max_new_tokens=64):
        self.llm_embeds_fn = llm_embeds_fn
        self.embed_fn = embed_fn
        self.eos_index = eos_index
        self.max_new_tokens = max_new_tokens

    def __call__(self, multimodal_embds, wav_lens=None, attention_mask=None):
        import jax

        B, T0, D = multimodal_embds.shape
        N = self.max_new_tokens
        buf = jnp.concatenate(
            [multimodal_embds, jnp.zeros((B, N, D), multimodal_embds.dtype)],
            axis=1,
        )

        def body(carry, i):
            buf, finished = carry
            logits = self.llm_embeds_fn(buf)
            step_logits = jax.lax.dynamic_slice_in_dim(
                logits, T0 - 1 + i, 1, axis=1
            )[:, 0]
            nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, self.eos_index, nxt)
            finished = jnp.logical_or(finished, nxt == self.eos_index)
            emb = self.embed_fn(nxt)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, emb[:, None, :], T0 + i, axis=1
            )
            return (buf, finished), nxt

        (_, _), tokens = jax.lax.scan(
            body, (buf, jnp.zeros((B,), bool)), jnp.arange(N)
        )
        tokens = np.asarray(jnp.moveaxis(tokens, 0, 1))  # (B, N)
        hyps, _ = _trim_rows(tokens, self.eos_index)
        return hyps, None


def _trim_rows(tokens, eos):
    hyps, lens = [], []
    for row in tokens:
        row = row.tolist()
        if eos in row:
            row = row[: row.index(eos)]
        hyps.append(row)
        lens.append(len(row))
    return hyps, lens


class SpeechLLMASR(Pretrained):
    """Speech-conditioned LLM transcription (reference ASR.py:1366):
    audio -> speech_encoder -> feat_downsampler -> proj into the LLM's
    embedding space; projected features are wrapped in
    ``<|start_of_audio|> ... <|end_of_audio|> prompt bos`` embeddings and
    the searcher module generates the transcript with the LLM decoder.

    modules: speech_encoder, feat_downsampler, proj, llm, normalize,
    searcher (e.g. SpeechLLMGreedySearcher). The llm module must expose
    ``tokenizer`` and ``embed_tokens(ids) -> embeddings``.
    """

    HPARAMS_NEEDED = ["bos_index", "eos_index", "prompt"]
    MODULES_NEEDED = [
        "speech_encoder", "feat_downsampler", "proj", "llm", "normalize",
        "searcher",
    ]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.mods.llm.tokenizer

    def build_multimodal_embds(self, audio_feats):
        """<|start_of_audio|> + audio + <|end_of_audio|> + prompt + bos
        as one embedding sequence (reference ASR.py:1413)."""
        tok = self.tokenizer
        prompt_ids = tok(self.hparams.prompt, add_special_tokens=False)[
            "input_ids"
        ]
        soa = tok.convert_tokens_to_ids("<|start_of_audio|>")
        eoa = tok.convert_tokens_to_ids("<|end_of_audio|>")
        ids = jnp.asarray(
            [soa] + [eoa] + list(prompt_ids) + [self.hparams.bos_index],
            jnp.int32,
        )
        B = audio_feats.shape[0]
        embds = self.mods.llm.embed_tokens(ids)  # (P, D)
        embds = jnp.broadcast_to(embds[None], (B,) + embds.shape)
        multimodal = jnp.concatenate(
            [embds[:, :1], audio_feats, embds[:, 1:]], axis=1
        )
        mask = jnp.ones(multimodal.shape[:2], bool)
        return multimodal, mask

    def encode_batch(self, wavs, wav_lens):
        wavs = self.mods.normalize(jnp.asarray(wavs), wav_lens)
        return self.mods.speech_encoder(wavs, wav_lens)

    def transcribe_batch(self, wavs, wav_lens):
        encoder_out = self.encode_batch(wavs, wav_lens)
        audio_down = self.mods.feat_downsampler(encoder_out)
        audio_feats = self.mods.proj(audio_down)
        embds, mask = self.build_multimodal_embds(audio_feats)
        hyps = self.mods.searcher(embds, wav_lens, mask)
        predicted_tokens = hyps[0]
        predicted_words = [
            self.tokenizer.decode(t, skip_special_tokens=True)
            for t in predicted_tokens
        ]
        return predicted_words, predicted_tokens

    def transcribe_file(self, path, **kwargs):
        waveform = self.load_audio(path, **kwargs)
        words, _ = self.transcribe_batch(waveform[None], jnp.ones(1))
        return words[0]

    def forward(self, wavs, wav_lens):
        return self.transcribe_batch(wavs, wav_lens)
