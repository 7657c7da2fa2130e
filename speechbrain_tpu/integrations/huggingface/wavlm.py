"""WavLM wrapper (reference
``speechbrain/integrations/huggingface/wavlm.py``). WavLM's gated
relative-position-bias attention has no Flax implementation, so this
runs the torch model host-side as a frozen feature extractor (the
reference's dominant use) via :class:`.torch_bridge.TorchHFBridge`."""

from speechbrain_tpu.integrations.huggingface.torch_bridge import (
    TorchHFBridge,
)


class WavLM(TorchHFBridge):
    """``__call__(wav)`` -> features (B, T', D) (or (L, B, T', D) with
    output_all_hiddens)."""

    def __init__(self, source, save_path="", freeze=True,
                 output_all_hiddens=False, config_only=False, **kwargs):
        super().__init__(
            "WavLMModel", source, save_path, freeze=freeze,
            config_only=config_only,
            output_all_hiddens=output_all_hiddens, **kwargs,
        )
