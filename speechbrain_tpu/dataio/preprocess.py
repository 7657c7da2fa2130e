"""Inference-time audio normalization.

Capability parity with the reference's ``speechbrain/dataio/preprocess.py``
(AudioNormalizer :8): resample + downmix to the model's expected format.
"""

import jax.numpy as jnp

from speechbrain_tpu.augment.time_domain import Resample


class AudioNormalizer:
    """Normalize audio to a sample rate and mono/keep channel layout.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> norm = AudioNormalizer(sample_rate=8000)
    >>> out = norm(jnp.ones((16000, 2)), 16000)
    >>> out.shape
    (8000,)
    """

    def __init__(self, sample_rate=16000, mix="avg-to-mono"):
        self.sample_rate = sample_rate
        if mix not in ["avg-to-mono", "keep"]:
            raise ValueError(f"Unexpected mixing configuration {mix}")
        self.mix = mix
        self._cached_resamplers = {}

    def __call__(self, audio, sample_rate):
        """audio: (time,) or (time, channels) -> normalized signal."""
        if sample_rate not in self._cached_resamplers:
            self._cached_resamplers[sample_rate] = Resample(
                orig_freq=sample_rate, new_freq=self.sample_rate
            )
        resampler = self._cached_resamplers[sample_rate]
        if audio.ndim == 2 and self.mix == "avg-to-mono":
            audio = jnp.mean(audio, axis=1)
        if audio.ndim == 1:
            return resampler(audio[None])[0]
        # keep channels: resample each
        chans = [resampler(audio[None, :, c])[0] for c in range(audio.shape[1])]
        return jnp.stack(chans, axis=1)
