"""Weighted-sum SSL representation (reference
``speechbrain/integrations/huggingface/weighted_ssl.py``): learnable
layer weights over all hidden states. The Flax implementation lives in
:mod:`speechbrain_tpu.integrations.huggingface.wav2vec2`; re-exported
here for layout parity."""

from speechbrain_tpu.integrations.huggingface.wav2vec2 import (  # noqa: F401
    WeightedSSLModel,
)
