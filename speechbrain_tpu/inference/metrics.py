"""Metric-estimation inference.

Capability parity with the reference's ``speechbrain/inference/metrics.py``
(SNREstimator :22): estimate the SNR of separated sources.
"""

import jax.numpy as jnp

from speechbrain_tpu.inference.interfaces import Pretrained


class SNREstimator(Pretrained):
    """Blind SNR estimation from (mixture, estimated sources)
    (reference metrics.py:22)."""

    MODULES_NEEDED = ["encoder", "encoder_out"]

    def estimate_batch(self, mix, predictions):
        """mix (B, T); predictions (B, T, n_src) -> SNR estimates (B,)."""
        # stack mixture with sources as channels for the encoder
        inp = jnp.concatenate([mix[..., None], predictions], axis=-1)
        enc = self.apply("encoder", inp, train=False)
        out = self.apply("encoder_out", enc, train=False)
        snrhat = jnp.mean(out, axis=tuple(range(1, out.ndim - 1)))
        return self.gettrue_snrrange(snrhat[..., 0] if out.shape[-1] == 1 else snrhat)

    def gettrue_snrrange(self, x, snr_min=-10.0, snr_max=10.0):
        """Map sigmoid outputs to the trained SNR range."""
        return (snr_max - snr_min) * jnp.clip(x, 0.0, 1.0) + snr_min
