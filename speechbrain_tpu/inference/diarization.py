"""Diarization inference.

Capability parity with the reference's ``speechbrain/inference/diarization.py``
(Speech_Emotion_Diarization :22) plus a speaker-diarization pipeline over
the alignment.diarization clustering backend.
"""

import numpy as np
import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class Speech_Emotion_Diarization(Pretrained):
    """Frame-level emotion diarization (reference diarization.py:22)."""

    MODULES_NEEDED = ["model"]

    def diarize_file(self, path, window=1.0, stride=0.5):
        audio = np.asarray(self.load_audio(path))
        sr = getattr(self.hparams, "sample_rate", 16000)
        win = int(window * sr)
        hop = int(stride * sr)
        segments = []
        for start in range(0, max(len(audio) - win, 1), hop):
            chunk = jnp.asarray(audio[start : start + win])[None]
            feats = (
                self.hparams.compute_features(chunk)
                if hasattr(self.hparams, "compute_features")
                else chunk
            )
            out = self.apply("model", feats, train=False)
            idx = int(jnp.argmax(out.reshape(-1, out.shape[-1])[-1]))
            label = (
                self.hparams.label_encoder.decode_ind(idx)
                if hasattr(self.hparams, "label_encoder")
                else idx
            )
            segments.append(
                {"start": start / sr, "end": (start + win) / sr, "emotion": label}
            )
        return segments


class SpeakerDiarization(Pretrained):
    """Embedding-based speaker diarization: VAD segments -> embeddings ->
    spectral clustering -> RTTM (composition of toolkit pieces)."""

    MODULES_NEEDED = ["embedding_model"]

    def diarize_segments(self, audio, segments, n_speakers=None):
        """audio (T,), segments [(start_s, end_s)] -> [(s, e, label)]."""
        from speechbrain_tpu.alignment.diarization import (
            do_spec_clustering,
            merge_ssegs_same_speaker,
        )

        sr = getattr(self.hparams, "sample_rate", 16000)
        embs = []
        for s, e in segments:
            chunk = jnp.asarray(audio[int(s * sr) : int(e * sr)])[None]
            feats = (
                self.hparams.compute_features(chunk)
                if hasattr(self.hparams, "compute_features")
                else chunk
            )
            emb = self.apply("embedding_model", feats, train=False)
            embs.append(np.asarray(emb).reshape(-1))
        labels = do_spec_clustering(np.stack(embs), n_speakers=n_speakers)
        return merge_ssegs_same_speaker(
            [(s, e, lab) for (s, e), lab in zip(segments, labels)]
        )
