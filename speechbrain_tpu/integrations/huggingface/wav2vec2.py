"""wav2vec2 / SSL encoder wrappers (Flax).

Capability parity with the reference's
``speechbrain/integrations/huggingface/wav2vec2.py`` (Wav2Vec2 :332):
use a pretrained wav2vec2 as a speech encoder (frozen or fine-tuned),
with output_norm and layer-output access for weighted-SSL probing.
"""

import jax
import jax.numpy as jnp

from speechbrain_tpu.integrations.huggingface.huggingface import (
    HFTransformersInterface,
)


class Wav2Vec2(HFTransformersInterface):
    """Pretrained wav2vec2 encoder: (B, T_samples) -> (B, T_frames, D).

    Arguments mirror the reference: freeze, freeze_feature_extractor,
    output_norm, output_all_hiddens.
    """

    def __init__(self, source, save_path="", output_norm=False, freeze=False,
                 freeze_feature_extractor=False, output_all_hiddens=False,
                 config_only=False, **kwargs):
        import transformers

        super().__init__(
            source, save_path=save_path, freeze=freeze,
            model_class=transformers.FlaxWav2Vec2Model,
            config_only=config_only, **kwargs,
        )
        self.output_norm = output_norm
        self.output_all_hiddens = output_all_hiddens
        self.freeze_feature_extractor = freeze_feature_extractor

    def __call__(self, wav, wav_lens=None):
        out = self.model(
            wav, params=self.params,
            output_hidden_states=self.output_all_hiddens,
        )
        if self.output_all_hiddens:
            feats = jnp.stack(out.hidden_states, axis=0)  # (L, B, T, D)
        else:
            feats = out.last_hidden_state
        if self.output_norm:
            feats = (feats - feats.mean(axis=-2, keepdims=True)) / (
                feats.std(axis=-2, keepdims=True) + 1e-5
            )
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def trainable_mask(self):
        import jax as _jax

        if self.freeze:
            return _jax.tree_util.tree_map(lambda _: False, self.params)
        if self.freeze_feature_extractor:
            def mark(path, _leaf):
                return "feature_extractor" not in "/".join(str(p) for p in path)

            flat = _jax.tree_util.tree_flatten_with_path(self.params)[0]
            treedef = _jax.tree_util.tree_structure(self.params)
            leaves = [
                mark([getattr(k, "key", str(k)) for k in path], leaf)
                for path, leaf in flat
            ]
            return _jax.tree_util.tree_unflatten(treedef, leaves)
        return _jax.tree_util.tree_map(lambda _: True, self.params)


class Wav2Vec2ForCTC(HFTransformersInterface):
    """wav2vec2 with a CTC head -> (B, T_frames, vocab) logits."""

    def __init__(self, source, save_path="", freeze=False, config_only=False,
                 **kwargs):
        import transformers

        super().__init__(
            source, save_path=save_path, freeze=freeze,
            model_class=transformers.FlaxWav2Vec2ForCTC,
            config_only=config_only, **kwargs,
        )

    def __call__(self, wav, wav_lens=None):
        out = self.model(wav, params=self.params)
        logits = out.logits
        if self.freeze:
            logits = jax.lax.stop_gradient(logits)
        return logits


class WeightedSSLModel(Wav2Vec2):
    """Learnable weighted sum over SSL hidden layers (reference
    huggingface/weighted_ssl.py:122). The weights live OUTSIDE the HF
    params — expose ``init_weights()`` and pass them to __call__."""

    def __init__(self, *args, **kwargs):
        kwargs["output_all_hiddens"] = True
        super().__init__(*args, **kwargs)

    def init_weights(self):
        n_layers = self.model.config.num_hidden_layers + 1
        return jnp.zeros((n_layers,))

    def __call__(self, wav, layer_weights=None, wav_lens=None):
        hiddens = super().__call__(wav, wav_lens)  # (L, B, T, D)
        if layer_weights is None:
            layer_weights = jnp.zeros((hiddens.shape[0],))
        norm = jax.nn.softmax(layer_weights)
        return jnp.einsum("l,lbtd->btd", norm, hiddens)
