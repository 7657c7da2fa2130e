"""w2v-BERT 2.0 wrapper (reference
``speechbrain/integrations/huggingface/w2v_bert.py``): frozen feature
extraction via the host-side torch bridge."""

import numpy as np

from speechbrain_tpu.integrations.huggingface.torch_bridge import (
    TorchHFBridge,
)


class Wav2Vec2BERT(TorchHFBridge):
    """``__call__(features)`` over SeamlessM4T-style input features."""

    def __init__(self, source, save_path="", freeze=True,
                 output_all_hiddens=False, config_only=False, **kwargs):
        super().__init__(
            "Wav2Vec2BertModel", source, save_path, freeze=freeze,
            config_only=config_only,
            output_all_hiddens=output_all_hiddens, **kwargs,
        )

    def _forward_torch(self, feats):
        import torch

        with torch.no_grad():
            return self.model(
                input_features=torch.as_tensor(
                    np.asarray(feats), dtype=torch.float32
                ),
                output_hidden_states=self.output_all_hiddens,
            )
