"""Vocoder inference interfaces.

Capability parity with the reference's ``speechbrain/inference/vocoders.py``
(HIFIGAN :26, DiffWaveVocoder :153, UnitHIFIGAN :298).
"""

import jax
import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class HIFIGAN(Pretrained):
    """Mel -> waveform (reference vocoders.py:26)."""

    MODULES_NEEDED = ["generator"]

    def decode_batch(self, spectrogram, mel_lens=None, hop_len=None):
        """(B, T, n_mel) -> (B, T*hop) waveforms; zero out padding when
        lengths are given."""
        wavs = self.apply("generator", spectrogram)
        if mel_lens is not None and hop_len is not None:
            T = wavs.shape[1]
            lens_abs = jnp.round(
                jnp.asarray(mel_lens) * spectrogram.shape[1]
            ) * hop_len
            mask = jnp.arange(T)[None, :] < lens_abs[:, None]
            wavs = wavs * mask
        return wavs

    def decode_spectrogram(self, spectrogram):
        return self.decode_batch(spectrogram[None])[0]

    def __call__(self, spectrogram):
        return self.decode_batch(spectrogram)


class DiffWaveVocoder(Pretrained):
    """Diffusion vocoder: mel -> waveform by DDPM sampling
    (reference vocoders.py:153)."""

    HPARAMS_NEEDED = ["diffusion"]
    MODULES_NEEDED = ["denoiser"]

    def decode_batch(self, mel, hop_len=256, fast_sampling=False, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B, T_mel, _ = mel.shape
        T_audio = T_mel * hop_len

        def model(audio, t):
            return self.apply("denoiser", audio, t, mel)

        return self.hparams.diffusion.sample((B, T_audio), rng, model=model)


class UnitHIFIGAN(Pretrained):
    """Discrete-unit vocoder (reference vocoders.py:298)."""

    MODULES_NEEDED = ["generator"]

    def decode_unit(self, units):
        return self.apply("generator", jnp.asarray(units)[None])[0]

    def decode_batch(self, units):
        return self.apply("generator", jnp.asarray(units))
