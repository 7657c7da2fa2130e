"""HuggingFace transformers wrappers (Flax-native)."""

from speechbrain_tpu.integrations.huggingface.huggingface import (  # noqa: F401
    HFTransformersInterface,
)
