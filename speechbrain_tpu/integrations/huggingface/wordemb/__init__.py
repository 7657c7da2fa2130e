"""Pretrained word-embedding helpers (reference
``speechbrain/integrations/huggingface/wordemb/``)."""

from speechbrain_tpu.integrations.huggingface.wordemb.transformer import (  # noqa: F401
    TransformerWordEmbeddings,
)
from speechbrain_tpu.integrations.huggingface.wordemb.util import (  # noqa: F401
    expand_to_chars,
)
