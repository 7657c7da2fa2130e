"""ASR inference interfaces.

Capability parity with the reference's ``speechbrain/inference/ASR.py``
(EncoderDecoderASR :35 with transcribe_file/encode_batch/transcribe_batch,
EncoderASR :176 CTC-only). Streaming ASR lives in streaming-capable
encoders + StreamingFeatureWrapper; the chunked interface follows in the
streaming module.
"""

import dataclasses

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
    (reference WhisperASR at ASR.py:~440).

    hparams: whisper (integrations.huggingface.whisper.Whisper),
    optionally language/task. ``transcribe_batch(wavs, wav_lens)``
    greedy-decodes; ``transcribe_file`` chunks a long file into
    30-second segments and returns ASRWhisperSegment records.
    """

    HPARAMS_NEEDED = ["whisper"]
    MODULES_NEEDED = []

    SAMPLE_RATE = 16000
    CHUNK_S = 30.0

    def encode_batch(self, wavs, wav_lens=None):
        """Whisper encoder states for padded audio."""
        return self.hparams.whisper.forward_encoder(jnp.asarray(wavs))

    def transcribe_batch(self, wavs, wav_lens=None, max_tokens=224):
        """Greedy decode; returns (texts, token id lists)."""
        whisper = self.hparams.whisper
        enc = self.encode_batch(wavs, wav_lens)
        tok = whisper.tokenizer
        import numpy as np

        prompt = tok.convert_tokens_to_ids(
            ["<|startoftranscript|>"]
        )
        B = enc.shape[0]
        ids = jnp.tile(jnp.asarray(prompt, jnp.int32)[None], (B, 1))
        eos = tok.eos_token_id
        finished = np.zeros(B, bool)
        for _ in range(max_tokens):
            logits = whisper.forward_decoder(enc, ids)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
            finished |= np.asarray(nxt) == eos
            if finished.all():
                break
        texts, token_lists = [], []
        for row in np.asarray(ids):
            toks = [int(t) for t in row[len(prompt):]
                    if int(t) != eos]
            token_lists.append(toks)
            texts.append(tok.decode(toks, skip_special_tokens=True).strip())
        return texts, token_lists

    def transcribe_file(self, path, **kwargs):
        """Chunk a long file into 30 s segments and transcribe each."""
        import numpy as np

        audio = np.asarray(self.load_audio(path))
        n = int(self.CHUNK_S * self.SAMPLE_RATE)
        segments = []
        for s in range(0, max(len(audio), 1), n):
            chunk = audio[s : s + n]
            seg = ASRWhisperSegment(
                start=s / self.SAMPLE_RATE,
                end=min(s + n, len(audio)) / self.SAMPLE_RATE,
                chunk=chunk,
            )
            texts, tokens = self.transcribe_batch(chunk[None], **kwargs)
            seg.words = texts[0]
            seg.tokens = tokens[0]
            segments.append(seg)
        return segments


class SpeechLLMASR(Pretrained):
    """Speech-conditioned LLM transcription (reference SpeechLLMASR):
    an audio encoder projects speech into the LLM's embedding space,
    then the LLM continues from a transcription prompt.

    hparams: encoder (wav -> (B, T', D) features), projector (features ->
    LLM embed dim), llm (causal LM wrapper with ``generate_greedy``),
    tokenizer.
    """

    HPARAMS_NEEDED = ["encoder", "projector", "llm", "tokenizer"]
    MODULES_NEEDED = []

    def transcribe_batch(self, wavs, wav_lens=None, max_new_tokens=64):
        """Encode audio, prefix with the prompt, greedy-generate text."""
        feats = self.hparams.encoder(jnp.asarray(wavs), wav_lens)
        _ = self.hparams.projector(feats)
        # The LLM consumes projected audio embeddings as a prefix; the
        # concrete fusion depends on the checkpoint's architecture and is
        # delegated to the hparams-provided llm wrapper.
        raise NotImplementedError(
            "SpeechLLMASR requires a checkpoint-specific fusion; provide "
            "an hparams 'fuse' callable or subclass transcribe_batch."
        )
