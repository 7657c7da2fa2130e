"""Text encoder wrappers (reference
``speechbrain/integrations/huggingface/textencoder.py`` and
``labse.py``): sentence embeddings from BERT-family encoders via
FlaxBert/FlaxAuto."""

import jax.numpy as jnp

from speechbrain_tpu.integrations.huggingface.huggingface import (
    HFTransformersInterface,
)


class TextEncoder(HFTransformersInterface):
    """Generic HF text encoder: ``__call__(input_ids, attention_mask)``
    -> last hidden states (B, T, D)."""

    def __init__(self, source, save_path="", freeze=True,
                 config_only=False, **kwargs):
        super().__init__(
            source, save_path, freeze=freeze, config_only=config_only,
            with_processor=False, **kwargs,
        )

    def __call__(self, input_ids, attention_mask=None):
        out = self.model(
            input_ids=jnp.asarray(input_ids),
            attention_mask=(
                jnp.asarray(attention_mask)
                if attention_mask is not None else None
            ),
            params=self.params,
        )
        return out.last_hidden_state


class LaBSE(TextEncoder):
    """Language-agnostic BERT sentence embeddings (reference labse.py):
    CLS-pooled, l2-normalized vectors for cross-lingual retrieval."""

    def __call__(self, input_ids, attention_mask=None):
        hidden = super().__call__(input_ids, attention_mask)
        pooled = hidden[:, 0, :]
        return pooled / (
            jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-9
        )
