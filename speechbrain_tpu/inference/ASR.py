"""ASR inference interfaces.

Capability parity with the reference's ``speechbrain/inference/ASR.py``
(EncoderDecoderASR :35 with transcribe_file/encode_batch/transcribe_batch,
EncoderASR :176 CTC-only). Streaming ASR lives in streaming-capable
encoders + StreamingFeatureWrapper; the chunked interface follows in the
streaming module.
"""

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
