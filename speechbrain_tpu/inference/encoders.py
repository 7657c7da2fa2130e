"""Generic encoder inference interfaces.

Capability parity with the reference's ``speechbrain/inference/encoders.py``
(WaveformEncoder :22, MelSpectrogramEncoder :104).
"""

import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class WaveformEncoder(Pretrained):
    """ssl/raw-waveform encoder frontend (reference encoders.py:22)."""

    MODULES_NEEDED = ["encoder"]

    def encode_batch(self, wavs, wav_lens=None):
        if wav_lens is None:
            wav_lens = jnp.ones(wavs.shape[0])
        return self.apply("encoder", wavs, train=False)

    def encode_file(self, path):
        wav = self.load_audio(path)
        return self.encode_batch(wav[None])[0]


class MelSpectrogramEncoder(Pretrained):
    """Mel-spectrogram speaker/prosody encoder (reference encoders.py:104)."""

    MODULES_NEEDED = ["embedding_model"]

    def encode_mel_spectrogram(self, mel):
        return self.apply("embedding_model", mel[None] if mel.ndim == 2 else mel,
                          train=False)

    def encode_mel_spectrogram_batch(self, mels, lens=None):
        return self.apply("embedding_model", mels, lengths=lens, train=False)

    def encode_waveform(self, wav):
        feats = self.hparams.compute_features(wav[None] if wav.ndim == 1 else wav)
        return self.apply("embedding_model", feats, train=False)
