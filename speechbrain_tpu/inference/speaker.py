"""Speaker recognition interface.

Capability parity with the reference's ``speechbrain/inference/speaker.py``
(SpeakerRecognition :22 with verify_batch/verify_files): ECAPA/x-vector
embeddings + cosine similarity verification.
"""

import jax.numpy as jnp

from speechbrain_tpu.inference.classifiers import EncoderClassifier


class SpeakerRecognition(EncoderClassifier):
    """Speaker verification by cosine similarity of embeddings."""

    MODULES_NEEDED = ["embedding_model"]

    def verify_batch(self, wavs1, wavs2, wav1_lens=None, wav2_lens=None,
                     threshold=0.25):
        """Returns (score, decision) for paired batches
        (reference speaker.py:50)."""
        emb1 = self.encode_batch(wavs1, wav1_lens, normalize=False)
        emb2 = self.encode_batch(wavs2, wav2_lens, normalize=False)
        if emb1.ndim == 3:
            emb1 = emb1[:, 0, :]
            emb2 = emb2[:, 0, :]
        num = jnp.sum(emb1 * emb2, axis=-1)
        den = jnp.linalg.norm(emb1, axis=-1) * jnp.linalg.norm(emb2, axis=-1)
        score = num / jnp.maximum(den, 1e-12)
        return score, score > threshold

    def verify_files(self, path_x, path_y, **kwargs):
        """Verify whether two audio files are the same speaker
        (reference speaker.py:86)."""
        waveform_x = self.load_audio(path_x)
        waveform_y = self.load_audio(path_y)
        score, decision = self.verify_batch(waveform_x[None], waveform_y[None])
        return score[0], bool(decision[0])
