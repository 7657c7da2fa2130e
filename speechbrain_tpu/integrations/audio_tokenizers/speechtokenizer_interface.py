"""SpeechTokenizer interface (reference
``speechbrain/integrations/audio_tokenizers/speechtokenizer_interface.py``;
SpeechTokenizer at speechtokenizer_interface.py:21).

The upstream ``speechtokenizer`` package (torch) is not bundled in this
environment. This wrapper constructs only when it is installed; outputs
are bridged to jax arrays so the rest of the pipeline stays on device.
For a dependency-free codec, use
:class:`speechbrain_tpu.lobes.models.discrete.dac.DAC`.
"""

import numpy as np

from speechbrain_tpu.utils.importutils import LazyModule

speechtokenizer = LazyModule("speechtokenizer")


class SpeechTokenizer:
    """RVQ speech tokenizer: ``encode(wav)`` -> (n_q, B, T) codes,
    ``decode(codes)`` -> waveform."""

    def __init__(self, source, save_path, sample_rate=16000):
        from speechbrain_tpu.utils.fetching import fetch

        cfg = fetch("config.json", source=source, savedir=save_path)
        ckpt = fetch("SpeechTokenizer.pt", source=source, savedir=save_path)
        self.model = speechtokenizer.SpeechTokenizer.load_from_checkpoint(
            str(cfg), str(ckpt)
        )
        self.model.eval()
        self.sample_rate = sample_rate

    def encode(self, inputs):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            codes = self.model.encode(
                torch.as_tensor(np.asarray(inputs)).unsqueeze(1)
            )
        return jnp.asarray(codes.cpu().numpy())

    def decode(self, tokens):
        import torch
        import jax.numpy as jnp

        with torch.no_grad():
            wav = self.model.decode(
                torch.as_tensor(np.asarray(tokens))
            )
        return jnp.asarray(wav.squeeze(1).cpu().numpy())

    def __call__(self, inputs):
        return self.encode(inputs)
