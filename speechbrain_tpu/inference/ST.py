"""Speech translation interfaces.

Capability parity with the reference's ``speechbrain/inference/ST.py``
(EncoderDecoderS2UT :22): speech -> target-language text or discrete units.
"""

import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class EncoderDecoderS2UT(Pretrained):
    """Speech-to-unit/text translation (reference ST.py:22)."""

    HPARAMS_NEEDED = []
    MODULES_NEEDED = []

    def translate_file(self, path):
        audio = self.load_audio(path)
        predictions = self.translate_batch(audio[None], jnp.ones(1))
        return predictions[0]

    def encode_batch(self, wavs, wav_lens):
        return self.hparams.encoder(wavs, wav_lens)

    def translate_batch(self, wavs, wav_lens):
        enc = self.encode_batch(wavs, wav_lens)
        hyps, _l, _s, _ = self.hparams.decoder(enc, wav_lens)
        if hasattr(self.hparams, "tokenizer"):
            return [self.hparams.tokenizer.decode_ids(h) for h in hyps]
        return hyps
