"""Host-side torch bridge for HF models without Flax implementations.

Several reference wrappers (WavLM, HuBERT, MERT, w2v-BERT, Encodec,
Mimi) target torch-only architectures. Rather than skipping them, this
bridge runs the torch model on the host CPU (frozen, no_grad) and moves
the outputs to the TPU as jax arrays — appropriate for frozen feature
extractors and codecs, which is exactly how the reference recipes use
them. For trainable SSL encoders on TPU, use
:class:`speechbrain_tpu.integrations.huggingface.wav2vec2.Wav2Vec2`
(Flax) or the native :class:`speechbrain_tpu.lobes.models.wav2vec.W2VLatentExtractor`.
"""

import numpy as np


class TorchHFBridge:
    """Load a torch HF model, expose jax-array IO.

    Arguments
    ---------
    model_class_name : str
        transformers class name, e.g. "WavLMModel".
    source : str
        HF repo id or local path.
    save_path : str
        Cache dir.
    config_only : bool
        Random-init from config (offline-friendly).
    output_all_hiddens : bool
        Stack all hidden states on axis 0.
    """

    def __init__(self, model_class_name, source, save_path="",
                 freeze=True, config_only=False, output_all_hiddens=False,
                 **kwargs):
        import transformers

        cls = getattr(transformers, model_class_name)
        if config_only:
            config = transformers.AutoConfig.from_pretrained(
                source, cache_dir=save_path or None, **kwargs
            )
            # Auto* classes can't be instantiated directly; dispatch on
            # the config type instead (the MERT wrapper's AutoModel path)
            if hasattr(cls, "from_config") and model_class_name.startswith(
                "Auto"
            ):
                self.model = cls.from_config(config)
            else:
                self.model = cls(config)
        else:
            self.model = cls.from_pretrained(
                source, cache_dir=save_path or None, **kwargs
            )
        self.model.eval()
        self.freeze = freeze
        self.output_all_hiddens = output_all_hiddens

    def _forward_torch(self, wav):
        import torch

        with torch.no_grad():
            return self.model(
                torch.as_tensor(np.asarray(wav), dtype=torch.float32),
                output_hidden_states=self.output_all_hiddens,
            )

    def __call__(self, wav, wav_lens=None):
        import jax.numpy as jnp

        out = self._forward_torch(wav)
        if self.output_all_hiddens:
            return jnp.asarray(
                np.stack([h.numpy() for h in out.hidden_states])
            )
        return jnp.asarray(out.last_hidden_state.numpy())

    def extract_features(self, wav, wav_lens=None):
        return self(wav, wav_lens)
