"""Interpretability inference.

Capability parity with the reference's
``speechbrain/inference/interpretability.py`` (PIQAudioInterpreter :29):
produce an interpretable audio reconstruction explaining a classifier's
decision.
"""

import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class PIQAudioInterpreter(Pretrained):
    """Post-hoc interpretation via quantized classifier representations
    (reference interpretability.py:29)."""

    MODULES_NEEDED = ["classifier", "psi"]

    def interpret_batch(self, wavs):
        """wavs (B, T) -> (interpretation audio, predicted class)."""
        feats = self.hparams.compute_features(wavs)
        hidden = self.apply("classifier", feats, train=False)
        mask = self.apply("psi", hidden, train=False)
        interp_spec = feats * jnp.clip(mask[..., : feats.shape[-1]], 0.0, 1.0) \
            if mask.ndim == feats.ndim else feats
        pred = int(jnp.argmax(hidden.reshape(hidden.shape[0], -1), axis=-1)[0])
        if hasattr(self.hparams, "compute_istft"):
            from speechbrain_tpu.processing.signal_processing import resynthesize

            wav_int = resynthesize(
                jnp.expm1(jnp.clip(interp_spec, 0, None)), wavs,
                self.hparams.compute_stft, self.hparams.compute_istft,
            )
            return wav_int, pred
        return interp_spec, pred

    def interpret_file(self, path):
        wav = self.load_audio(path)
        return self.interpret_batch(wav[None])
