"""Vocos vocoder wrapper (reference
``speechbrain/integrations/huggingface/vocos.py``). The upstream
``vocos`` package (torch) is not bundled; this wrapper constructs only
when installed. For a native neural vocoder use
:class:`speechbrain_tpu.lobes.models.HifiGAN.HifiganGenerator`."""

import numpy as np

from speechbrain_tpu.utils.importutils import LazyModule

vocos = LazyModule("vocos")


class Vocos:
    """``__call__(mel)`` -> waveform, via vocos.Vocos."""

    def __init__(self, source="charactr/vocos-mel-24khz", save_path="",
                 freeze=True):
        self.model = vocos.Vocos.from_pretrained(source)
        self.freeze = freeze

    def __call__(self, mel):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            wav = self.model.decode(
                torch.as_tensor(np.asarray(mel), dtype=torch.float32)
            )
        return jnp.asarray(wav.numpy())

    decode = __call__
