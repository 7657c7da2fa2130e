"""Source separation interface.

Capability parity with the reference's ``speechbrain/inference/separation.py``
(SepformerSeparation :27 with separate_batch/separate_file).
"""

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.inference.interfaces import Pretrained


class SepformerSeparation(Pretrained):
    """Separate a mixture into sources with a (Sep/RE-Sep)former model."""

    MODULES_NEEDED = ["masknet"]

    def separate_batch(self, mix):
        """(B, T) mixture -> (B, T, n_spks) sources.

        Mirrors the reference's three-module composition when an
        encoder/masknet/decoder checkpoint is loaded (reference
        separation.py:46-83: ``mix_w = encoder(mix); est_mask =
        masknet(mix_w); sources = decoder(mix_w * est_mask)`` per
        speaker, padded/trimmed back to the input length); falls back to
        a single full-wrapper masknet module or an hparams-provided
        separator callable."""
        has = lambda n: hasattr(self.mods, n) and self.params.get(n)
        if has("encoder") and has("masknet") and has("decoder"):
            mix_w = self.apply("encoder", mix)  # (B, T', N)
            est_mask = self.apply("masknet", mix_w)  # (spks, B, T', N)
            sep_h = mix_w[None] * est_mask
            est = jnp.stack(
                [
                    self.apply("decoder", sep_h[i])
                    for i in range(est_mask.shape[0])
                ],
                axis=-1,
            )  # (B, T_est, spks)
            T0, Te = mix.shape[1], est.shape[1]
            if T0 > Te:
                est = jnp.pad(est, ((0, 0), (0, T0 - Te), (0, 0)))
            else:
                est = est[:, :T0]
            return est
        if has("masknet"):
            return self.apply("masknet", mix, train=False)
        # hparams-provided full wrapper
        return self.hparams.separator(mix)

    def separate_file(self, path, savedir="audio_cache"):
        """Separate one file; returns (T, n_spks) (reference :87)."""
        mixture = self.load_audio(path)
        est_sources = self.separate_batch(mixture[None])
        # normalize each source to the mixture max
        mx = jnp.max(jnp.abs(est_sources), axis=1, keepdims=True)
        est_sources = est_sources / jnp.maximum(mx, 1e-9)
        return est_sources[0]
