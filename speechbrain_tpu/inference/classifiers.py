"""Classification inference interfaces.

Capability parity with the reference's ``speechbrain/inference/classifiers.py``
(EncoderClassifier :27, AudioClassifier :192).
"""

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.inference.interfaces import Pretrained


class EncoderClassifier(Pretrained):
    """Embedding extractor + categorical classifier
    (reference classifiers.py:27).

    hparams: compute_features, mean_var_norm (optional), embedding_model,
    classifier, label_encoder.
    """

    MODULES_NEEDED = ["embedding_model", "classifier"]

    def encode_batch(self, wavs, wav_lens=None, normalize=False):
        """Wavs -> speaker/class embeddings (reference classifiers.py:68)."""
        if wav_lens is None:
            wav_lens = jnp.ones(wavs.shape[0])
        if wavs.ndim == 1:
            wavs = wavs[None]
        feats = self.hparams.compute_features(wavs)
        if hasattr(self.hparams, "mean_var_norm") and self.hparams.mean_var_norm:
            feats = self.hparams.mean_var_norm(feats, wav_lens)
        embeddings = self.apply(
            "embedding_model", feats, lengths=wav_lens, train=False
        )
        if normalize:
            embeddings = embeddings / jnp.maximum(
                jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12
            )
        return embeddings

    def classify_batch(self, wavs, wav_lens=None):
        """Returns (posteriors, score, index, text_lab)
        (reference classifiers.py:128)."""
        emb = self.encode_batch(wavs, wav_lens)
        out_prob = self.apply("classifier", emb, train=False)
        if out_prob.ndim == 3:
            out_prob = out_prob[:, 0, :]
        score = jnp.max(out_prob, axis=-1)
        index = jnp.argmax(out_prob, axis=-1)
        text_lab = None
        if hasattr(self.hparams, "label_encoder") and len(
            getattr(self.hparams.label_encoder, "ind2lab", {})
        ):
            text_lab = self.hparams.label_encoder.decode_ndim(np.asarray(index))
        return out_prob, score, index, text_lab

    def classify_file(self, path, **kwargs):
        waveform = self.load_audio(path)
        return self.classify_batch(waveform[None])


class AudioClassifier(EncoderClassifier):
    """Generic audio tagging variant (reference classifiers.py:192)."""
