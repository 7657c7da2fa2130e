"""MERT music-SSL wrapper (reference
``speechbrain/integrations/huggingface/mert.py``): frozen feature
extraction via the host-side torch bridge."""

from speechbrain_tpu.integrations.huggingface.torch_bridge import (
    TorchHFBridge,
)


class MERT(TorchHFBridge):
    """``__call__(wav)`` -> music features (B, T', D)."""

    def __init__(self, source, save_path="", freeze=True,
                 output_all_hiddens=False, config_only=False, **kwargs):
        kwargs.setdefault("trust_remote_code", True)
        super().__init__(
            "AutoModel", source, save_path, freeze=freeze,
            config_only=config_only,
            output_all_hiddens=output_all_hiddens, **kwargs,
        )
