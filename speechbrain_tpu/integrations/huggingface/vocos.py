"""Vocos vocoder wrapper (reference
``speechbrain/integrations/huggingface/vocos.py:46-158``): EnCodec
tokens -> waveform through the upstream ``vocos`` torch package, which
is NOT bundled in this image — construction raises with the missing
wheel named. For a native neural vocoder use
:class:`speechbrain_tpu.lobes.models.HifiGAN.HifiganGenerator`."""

import numpy as np

from speechbrain_tpu.utils.importutils import LazyModule

vocos = LazyModule("vocos")


class Vocos:
    """EnCodec-token vocoder with the reference surface.

    ``forward(inputs, length)`` takes (B, T, K) EnCodec token indices
    plus relative lengths and returns (masked waveforms (B, L),
    lengths) — the reference's codes_to_features + bandwidth-indexed
    decode + length masking (ref vocos.py:130-158). ``decode(mel)``
    additionally exposes the mel-to-wav path of mel-flavored Vocos
    checkpoints.
    """

    def __init__(self, source="charactr/vocos-encodec-24khz",
                 save_path="", revision=None, bandwidth_id=0,
                 freeze=True):
        # touching the LazyModule raises ModuleNotFoundError naming the
        # 'vocos' wheel when it is not installed
        self.model = vocos.Vocos.from_pretrained(source)
        self.bandwidth_id = bandwidth_id
        self.freeze = freeze
        if freeze:
            self.model.eval()

    def forward(self, inputs, length):
        import torch
        import jax.numpy as jnp

        tokens = torch.as_tensor(np.asarray(inputs), dtype=torch.long)
        with torch.no_grad():
            # (B, T, K) -> (K, B, T), the vocos codebook-major layout
            features = self.model.codes_to_features(
                tokens.permute(2, 0, 1)
            )
            wavs = self.model.decode(
                features, bandwidth_id=torch.tensor([self.bandwidth_id])
            )
        wavs = jnp.asarray(wavs.numpy())
        L = wavs.shape[1]
        mask = (
            jnp.arange(L)[None, :]
            < jnp.round(jnp.asarray(length) * L)[:, None]
        )
        return wavs * mask, jnp.asarray(length)

    __call__ = forward

    def decode(self, mel):
        """Mel-to-wav path of mel-flavored Vocos checkpoints."""
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            wav = self.model.decode(
                torch.as_tensor(np.asarray(mel), dtype=torch.float32)
            )
        return jnp.asarray(wav.numpy())
