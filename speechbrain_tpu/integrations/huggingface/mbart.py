"""mBART wrapper (reference
``speechbrain/integrations/huggingface/mbart.py``): multilingual
seq2seq decoder for speech translation, via FlaxMBart."""

import jax.numpy as jnp

from speechbrain_tpu.integrations.huggingface.huggingface import (
    HFTransformersInterface,
)


class mBART(HFTransformersInterface):
    """mBART decoder conditioned on speech encoder states.

    ``__call__(enc_states, dec_input_ids)`` -> decoder logits; mirrors
    the reference's use as an ST decoder (encoder outputs are passed as
    pre-computed hidden states).
    """

    def __init__(self, source, save_path="", freeze=False, target_lang="de_DE",
                 decoder_only=True, config_only=False, **kwargs):
        import transformers

        super().__init__(
            source, save_path, freeze=freeze,
            model_class=transformers.FlaxMBartForConditionalGeneration,
            config_only=config_only, **kwargs,
        )
        self.target_lang = target_lang
        self.decoder_only = decoder_only

    def __call__(self, enc_states, dec_input_ids, enc_attention_mask=None):
        out = self.model.decode(
            decoder_input_ids=jnp.asarray(dec_input_ids),
            encoder_outputs=(jnp.asarray(enc_states),),
            encoder_attention_mask=(
                jnp.asarray(enc_attention_mask)
                if enc_attention_mask is not None else None
            ),
            params=self.params,
        )
        return out.logits
