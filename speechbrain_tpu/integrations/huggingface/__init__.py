"""HuggingFace transformers wrappers.

Flax-native where transformers ships Flax weights (wav2vec2, whisper,
GPT-2, LLaMA, mBART, BERT/LaBSE); torch-bridged host-side for
torch-only architectures used as frozen extractors/codecs (WavLM,
HuBERT, MERT, w2v-BERT, Encodec, Mimi).
"""

from speechbrain_tpu.integrations.huggingface.huggingface import (  # noqa: F401
    HFTransformersInterface,
)
