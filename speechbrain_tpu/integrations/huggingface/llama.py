"""LLaMA wrapper (reference
``speechbrain/integrations/huggingface/llama.py``; LLM class there):
causal LM for dialogue/LLM-conditioned tasks, via FlaxLlamaModel."""

import jax.numpy as jnp

from speechbrain_tpu.integrations.huggingface.huggingface import (
    HFTransformersInterface,
)


class Llama(HFTransformersInterface):
    """Causal LLaMA language model.

    ``__call__(input_ids, attention_mask)`` -> logits (B, T, V).
    Generation uses the searcher-friendly ``forward_step``.
    """

    def __init__(self, source, save_path="", freeze=False,
                 config_only=False, with_lm_head=True, **kwargs):
        import transformers

        cls = (
            transformers.FlaxLlamaForCausalLM
            if with_lm_head else transformers.FlaxLlamaModel
        )
        super().__init__(
            source, save_path, freeze=freeze, model_class=cls,
            config_only=config_only, **kwargs,
        )
        self.with_lm_head = with_lm_head

    def __call__(self, input_ids, attention_mask=None):
        out = self.model(
            input_ids=jnp.asarray(input_ids),
            attention_mask=(
                jnp.asarray(attention_mask)
                if attention_mask is not None else None
            ),
            params=self.params,
        )
        return out.logits if self.with_lm_head else out.last_hidden_state

    def embed_tokens(self, ids):
        """Token ids -> input embeddings (the LLM's embedding table);
        used by SpeechLLMASR to build multimodal prefixes."""
        params = self.params
        table = params.get("model", params).get("embed_tokens", {}).get(
            "embedding"
        )
        if table is None:
            raise RuntimeError("No embed_tokens table in params")
        return jnp.take(jnp.asarray(table), jnp.asarray(ids), axis=0)

    def generate_greedy(self, input_ids, max_new_tokens=32,
                        eos_token_id=None):
        """Greedy continuation (host loop over jitted steps)."""
        ids = jnp.asarray(input_ids)
        for _ in range(max_new_tokens):
            logits = self(ids)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]
            ids = jnp.concatenate([ids, nxt], axis=1)
            if eos_token_id is not None and bool(
                (nxt == eos_token_id).all()
            ):
                break
        return ids
