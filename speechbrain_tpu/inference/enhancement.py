"""Speech enhancement interfaces.

Capability parity with the reference's ``speechbrain/inference/enhancement.py``
(SpectralMaskEnhancement :43, WaveformEnhancement :150).
"""

import numpy as np
import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class SpectralMaskEnhancement(Pretrained):
    """Mask-based spectral enhancement (MetricGAN-style;
    reference enhancement.py:43).

    hparams: compute_stft, compute_istft, spectral_magnitude resolved in
    compute_features; module: enhance_model.
    """

    HPARAMS_NEEDED = ["compute_stft", "compute_istft"]
    MODULES_NEEDED = ["enhance_model"]

    def compute_features(self, wavs):
        """Magnitude spectra in log1p domain (reference :79)."""
        feats = self.hparams.compute_stft(wavs)
        feats = jnp.sqrt(feats.real**2 + feats.imag**2 + 1e-14)
        return jnp.log1p(feats)

    def enhance_batch(self, noisy, lengths=None):
        """Enhance a padded batch (reference :93)."""
        noisy_features = self.compute_features(noisy)
        mask = self.apply("enhance_model", noisy_features, train=False)
        enhanced_log1p = noisy_features * mask
        enhanced_mag = jnp.expm1(enhanced_log1p)
        from speechbrain_tpu.processing.signal_processing import resynthesize

        return resynthesize(
            enhanced_mag, noisy, self.hparams.compute_stft,
            self.hparams.compute_istft,
        )

    def enhance_file(self, path, output_path=None):
        noisy = self.load_audio(path)[None]
        enhanced = self.enhance_batch(noisy)
        if output_path is not None:
            from speechbrain_tpu.dataio.dataio import write_audio

            write_audio(
                output_path, enhanced[0],
                getattr(self.hparams, "sample_rate", 16000),
            )
        return enhanced[0]


class WaveformEnhancement(Pretrained):
    """Direct waveform-to-waveform enhancement (reference enhancement.py:150)."""

    MODULES_NEEDED = ["enhance_model"]

    def enhance_batch(self, noisy, lengths=None):
        return self.apply("enhance_model", noisy, train=False)

    def enhance_file(self, path, output_path=None):
        noisy = self.load_audio(path)[None]
        enhanced = self.enhance_batch(noisy)
        if output_path is not None:
            from speechbrain_tpu.dataio.dataio import write_audio

            write_audio(output_path, enhanced[0], 16000)
        return enhanced[0]


class SGMSEEnhancement(Pretrained):
    """Score-based diffusion enhancement (reference enhancement.py
    SGMSEEnhancement): predictor-corrector sampling over the OUVE SDE in
    the complex-STFT domain, via
    :class:`speechbrain_tpu.integrations.models.sgmse_plus.ScoreModel`.

    hparams: compute_stft (STFT), score_model (ScoreModel), n_steps.
    """

    HPARAMS_NEEDED = ["compute_stft"]
    MODULES_NEEDED = ["score_model"]

    def enhance_batch(self, noisy, lengths=None, rng=None, n_steps=None):
        """Waveforms (B, T) -> enhanced waveforms via reverse diffusion."""
        import jax


        stft = self.hparams.compute_stft
        spec = stft(jnp.asarray(noisy))
        y = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, T, F, 2)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        model = self.mods.score_model
        x = model.apply(
            {"params": self.params.get("score_model", {})},
            y, rng, n_steps or getattr(self.hparams, "n_steps", None),
            method="enhance",
        )
        est = x[..., 0] + 1j * x[..., 1]
        return stft.inverse()(est)

    def enhance_file(self, filename, output_filename=None, **kwargs):
        """Enhance one file; optionally write the result as WAV."""
        noisy = self.load_audio(filename)[None]
        enhanced = self.enhance_batch(noisy, **kwargs)
        if output_filename is not None:
            from speechbrain_tpu.dataio.audio_io import save

            save(output_filename, np.asarray(enhanced[0]),
                 self.hparams.compute_stft.sample_rate)
        return enhanced[0]
