"""Mimi codec wrapper (reference
``speechbrain/integrations/huggingface/mimi.py``): Kyutai's streaming
codec via the host-side torch bridge."""

import numpy as np

from speechbrain_tpu.integrations.huggingface.torch_bridge import (
    TorchHFBridge,
)


class Mimi(TorchHFBridge):
    """``encode(wav)`` -> codes (B, n_q, T'); ``decode(codes)`` -> wav."""

    def __init__(self, source, save_path="", sample_rate=24000,
                 num_codebooks=8, freeze=True, config_only=False, **kwargs):
        super().__init__(
            "MimiModel", source, save_path, freeze=freeze,
            config_only=config_only, **kwargs,
        )
        self.sample_rate = sample_rate
        self.num_codebooks = num_codebooks

    def encode(self, wav, wav_lens=None):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            out = self.model.encode(
                torch.as_tensor(
                    np.asarray(wav), dtype=torch.float32
                ).unsqueeze(1),
                num_quantizers=self.num_codebooks,
            )
        return jnp.asarray(out.audio_codes.numpy())

    def decode(self, codes):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            wav = self.model.decode(
                torch.as_tensor(np.asarray(codes))
            ).audio_values
        return jnp.asarray(wav.squeeze(1).numpy())

    def __call__(self, wav, wav_lens=None):
        return self.encode(wav, wav_lens)
