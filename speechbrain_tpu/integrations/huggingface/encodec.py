"""EnCodec neural codec wrapper (reference
``speechbrain/integrations/huggingface/encodec.py``): encode/decode via
the host-side torch bridge (no Flax Encodec); for a fully on-device
codec use :class:`speechbrain_tpu.lobes.models.discrete.dac.DAC`."""

import numpy as np

from speechbrain_tpu.integrations.huggingface.torch_bridge import (
    TorchHFBridge,
)


class Encodec(TorchHFBridge):
    """``encode(wav)`` -> codes (B, n_q, T'); ``decode(codes)`` -> wav;
    ``embeddings(codes)`` -> codebook vectors."""

    def __init__(self, source, save_path="", sample_rate=24000,
                 bandwidth=1.5, flat_embeddings=False, freeze=True,
                 renorm_embeddings=True, config_only=False, **kwargs):
        super().__init__(
            "EncodecModel", source, save_path, freeze=freeze,
            config_only=config_only, **kwargs,
        )
        self.sample_rate = sample_rate
        self.bandwidth = bandwidth
        self.flat_embeddings = flat_embeddings

    def encode(self, wav, wav_lens=None):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            out = self.model.encode(
                torch.as_tensor(
                    np.asarray(wav), dtype=torch.float32
                ).unsqueeze(1),
                bandwidth=self.bandwidth,
            )
        codes = out.audio_codes[0]  # (B, n_q, T)
        return jnp.asarray(codes.numpy())

    def decode(self, codes, length=None):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            wav = self.model.decode(
                torch.as_tensor(np.asarray(codes)).unsqueeze(0), [None]
            ).audio_values
        return jnp.asarray(wav.squeeze(1).numpy())

    def embeddings(self, codes):
        import torch
        import jax.numpy as jnp

        q = self.model.quantizer
        with torch.no_grad():
            embs = []
            t = torch.as_tensor(np.asarray(codes))
            for i, layer in enumerate(q.layers[: t.shape[1]]):
                embs.append(layer.codebook.embed[t[:, i]])
            emb = torch.stack(embs, dim=1)  # (B, n_q, T, D)
        out = jnp.asarray(emb.numpy())
        if self.flat_embeddings:
            B, N, T, D = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, T, N * D)
        return out

    def __call__(self, wav, wav_lens=None):
        return self.encode(wav, wav_lens)
