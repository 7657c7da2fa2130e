"""Spoken language understanding interface.

Capability parity with the reference's ``speechbrain/inference/SLU.py``
(EndToEndSLU :23): speech -> semantics (intent/slots as a decoded string).
"""

import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class EndToEndSLU(Pretrained):
    """Direct speech-to-semantics decoding (reference SLU.py:23)."""

    HPARAMS_NEEDED = ["tokenizer"]
    MODULES_NEEDED = []

    def decode_file(self, path, **kwargs):
        waveform = self.load_audio(path)
        batch = waveform[None]
        rel_length = jnp.ones(1)
        predicted_words, predicted_tokens = self.decode_batch(batch, rel_length)
        return predicted_words[0]

    def encode_batch(self, wavs, wav_lens):
        return self.hparams.slu_enc(wavs, wav_lens)

    def decode_batch(self, wavs, wav_lens):
        encoder_out = self.encode_batch(wavs, wav_lens)
        hyps, _lens, _scores, _ = self.hparams.beam_searcher(encoder_out, wav_lens)
        predicted_words = [
            self.hparams.tokenizer.decode_ids(tokens) for tokens in hyps
        ]
        return predicted_words, hyps
