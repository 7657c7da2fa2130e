"""GPT-2 style causal LM wrapper (Flax).

Capability parity with the reference's
``speechbrain/integrations/huggingface/gpt.py`` (GPT :179): response
generation / LM scoring for dialogue and rescoring recipes.
"""

import jax
import jax.numpy as jnp

from speechbrain_tpu.integrations.huggingface.huggingface import (
    HFTransformersInterface,
)


class GPT(HFTransformersInterface):
    """Causal LM: (B, U) ids -> (B, U, vocab) logits; ``generate`` greedy."""

    def __init__(self, source, save_path="", freeze=False, max_new_tokens=50,
                 config_only=False, **kwargs):
        import transformers

        super().__init__(
            source, save_path=save_path, freeze=freeze,
            model_class=transformers.FlaxGPT2LMHeadModel,
            config_only=config_only, **kwargs,
        )
        self.max_new_tokens = max_new_tokens

    def __call__(self, input_ids, attention_mask=None):
        out = self.model(
            input_ids, attention_mask=attention_mask, params=self.params
        )
        logits = out.logits
        if self.freeze:
            logits = jax.lax.stop_gradient(logits)
        return logits

    def generate(self, input_ids, eos_token_id=None, max_new_tokens=None):
        """Greedy continuation (host loop over jitted forward)."""
        max_new = max_new_tokens or self.max_new_tokens
        tokens = input_ids
        for _ in range(max_new):
            logits = self(tokens)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]
            tokens = jnp.concatenate([tokens, nxt], axis=1)
            if eos_token_id is not None and bool((nxt == eos_token_id).all()):
                break
        return tokens
