"""TTS inference interfaces.

Capability parity with the reference's ``speechbrain/inference/TTS.py``
(Tacotron2 :36, FastSpeech2 :372, MSTacotron2 :136): text -> mel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.inference.interfaces import Pretrained


class Tacotron2(Pretrained):
    """Text -> mel with a Tacotron2 model (reference TTS.py:36)."""

    MODULES_NEEDED = ["model"]

    def text_to_seq(self, txt):
        from speechbrain_tpu.utils.text_to_sequence import text_to_sequence

        seq = text_to_sequence(txt)
        return seq, len(seq)

    def encode_batch(self, texts, max_decoder_steps=None, spk_embs=None):
        """List of strings -> (mel_outputs (B, T, n_mel), mel_lengths).
        ``spk_embs`` (B, E) conditions multi-speaker models
        (MSTacotron2); single-speaker models ignore it."""
        from speechbrain_tpu.utils.data_utils import batch_pad_right

        seqs = [np.asarray(self.text_to_seq(t)[0], np.int32) for t in texts]
        tokens, lens = batch_pad_right(seqs)
        kwargs = {} if spk_embs is None else {"spk_embs": jnp.asarray(spk_embs)}
        mel, lengths, gates = self.apply(
            "model", jnp.asarray(tokens), jnp.asarray(lens),
            max_steps=max_decoder_steps,
            rngs={"dropout": jax.random.PRNGKey(0)},
            method="infer", **kwargs,
        )
        return mel, lengths

    def encode_text(self, text, **kwargs):
        return self.encode_batch([text], **kwargs)

    def __call__(self, texts):
        return self.encode_batch(texts)


class FastSpeech2(Pretrained):
    """Text -> mel with FastSpeech2 (reference TTS.py:372)."""

    MODULES_NEEDED = ["model"]

    def encode_batch(self, tokens, pace=1.0, pitch_rate=1.0, energy_rate=1.0):
        return self.apply(
            "model", jnp.asarray(tokens), pace=pace, pitch_rate=pitch_rate,
            energy_rate=energy_rate, method="infer",
        )

    def encode_text(self, text, **kwargs):
        from speechbrain_tpu.utils.text_to_sequence import text_to_sequence

        seq = jnp.asarray([text_to_sequence(text)], jnp.int32)
        return self.encode_batch(seq, **kwargs)


class MSTacotron2(Tacotron2):
    """Zero-shot multi-speaker Tacotron2 (reference TTS.py:136): adds a
    speaker embedding conditioning input threaded through synthesis."""

    def _speaker_embedding(self, audio_path):
        """Reference-audio -> (1, E) speaker embedding via the hparams
        encoder (ref TTS.py:225-241)."""
        spk_emb = self.hparams.spk_emb_encoder(
            self.load_audio(audio_path)[None]
        )
        spk_emb = jnp.asarray(spk_emb)
        if spk_emb.ndim == 3:  # (B, 1, E) classifier output
            spk_emb = spk_emb[:, 0, :]
        return spk_emb

    def clone_voice(self, texts, audio_path):
        """Synthesize ``texts`` in the voice of ``audio_path``: the
        speaker embedding is repeated per text and passed into the
        model's conditioned inference (ref TTS.py:209-252,
        ``spk_embs = spk_emb.repeat(len(texts), 1)`` -> infer)."""
        if isinstance(texts, str):
            texts = [texts]
        spk_emb = self._speaker_embedding(audio_path)
        spk_embs = jnp.repeat(spk_emb, len(texts), axis=0)
        return self.encode_batch(texts, spk_embs=spk_embs)

    def generate_random_voice(self, texts):
        """Synthesize with a randomly sampled speaker embedding
        (ref TTS.py:262-286 samples from a pretrained GMM; without one
        in hparams, a unit-normal sample of the model's embedding size
        is used)."""
        if isinstance(texts, str):
            texts = [texts]
        E = getattr(self.hparams, "spk_emb_size", None)
        if E is None:
            E = getattr(self.mods["model"], "spk_emb_size", 192)
        sampler = getattr(self.hparams, "random_speaker_sampler", None)
        if sampler is not None:
            spk_emb = jnp.asarray(sampler(), jnp.float32).reshape(1, -1)
        else:
            spk_emb = jax.random.normal(
                jax.random.PRNGKey(np.random.randint(2**31)), (1, E)
            )
        spk_embs = jnp.repeat(spk_emb, len(texts), axis=0)
        return self.encode_batch(texts, spk_embs=spk_embs)


class FastSpeech2InternalAlignment(FastSpeech2):
    """FastSpeech2 trained with internal alignment (reference TTS.py
    FastSpeech2InternalAlignment): same inference surface; durations come
    from the internally learned aligner instead of external MFA targets,
    so checkpoints differ but encode_batch/infer are identical."""
