"""HuBERT wrapper (reference
``speechbrain/integrations/huggingface/hubert.py``): frozen feature
extraction via the host-side torch bridge (no Flax HuBERT in
transformers)."""

from speechbrain_tpu.integrations.huggingface.torch_bridge import (
    TorchHFBridge,
)


class HuBERT(TorchHFBridge):
    """``__call__(wav)`` -> features (B, T', D)."""

    def __init__(self, source, save_path="", freeze=True,
                 output_all_hiddens=False, config_only=False, **kwargs):
        super().__init__(
            "HubertModel", source, save_path, freeze=freeze,
            config_only=config_only,
            output_all_hiddens=output_all_hiddens, **kwargs,
        )
