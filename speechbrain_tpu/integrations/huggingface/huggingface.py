"""Base interface for HuggingFace transformers models (Flax).

Capability parity with the reference's
``speechbrain/integrations/huggingface/huggingface.py``
(HFTransformersInterface :455): fetch/load a pretrained Flax model +
its processor, expose freeze control as a trainable-params mask (the
functional analogue of requires_grad_(False)).
"""

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class HFTransformersInterface:
    """Load a Flax transformers model.

    Arguments
    ---------
    source : str
        HF repo id or local path.
    save_path : str
        Cache directory.
    freeze : bool
        If True, ``trainable_mask()`` marks all params frozen.
    model_class : type, optional
        Explicit Flax*Model class; otherwise FlaxAutoModel.
    with_processor : bool
        Also load the AutoProcessor / feature extractor.
    from_pt : bool
        Convert torch weights on load (needs torch; works offline when
        the checkpoint is local).
    """

    def __init__(self, source, save_path="", freeze=False, model_class=None,
                 with_processor=False, from_pt=False, config_only=False,
                 **model_kwargs):
        import transformers

        self.source = source
        self.freeze = freeze
        cls = model_class
        if cls is None:
            cls = transformers.FlaxAutoModel
        if config_only:
            config = transformers.AutoConfig.from_pretrained(
                source, cache_dir=save_path or None
            )
            self.model = cls.from_config(config) if hasattr(cls, "from_config") else cls(config)
        else:
            self.model = cls.from_pretrained(
                source, cache_dir=save_path or None, from_pt=from_pt,
                **model_kwargs,
            )
        self.params = self.model.params
        self.processor = None
        if with_processor:
            try:
                self.processor = transformers.AutoProcessor.from_pretrained(
                    source, cache_dir=save_path or None
                )
            except Exception:  # feature extractor fallback
                try:
                    self.processor = (
                        transformers.AutoFeatureExtractor.from_pretrained(
                            source, cache_dir=save_path or None
                        )
                    )
                except Exception:
                    # checkpoint dir without processor files (offline /
                    # weights-only): wrappers fall back to native
                    # feature extraction (e.g. Whisper._log_mel)
                    import logging

                    logging.getLogger(__name__).warning(
                        "no processor/feature-extractor files at %r; "
                        "using the wrapper's native frontend", source,
                    )

    def trainable_mask(self):
        """Pytree of bools for optax.masked: False everywhere when frozen."""
        import jax

        return jax.tree_util.tree_map(lambda _: not self.freeze, self.params)

    def __call__(self, *args, **kwargs):
        return self.model(*args, params=self.params, **kwargs)
