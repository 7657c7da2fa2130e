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
        """(B, T) mixture -> (B, T, n_spks) sources
        (reference separation.py:55)."""
        if hasattr(self.mods, "masknet") and self.params.get("masknet"):
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
