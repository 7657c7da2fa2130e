"""BGE-M3 sentence embeddings (reference
``speechbrain/integrations/nlp/bgeM3_embeddings.py``;
BGEM3SentenceEmbeddings at bgeM3_embeddings.py:28). FlagEmbedding is not
bundled — constructs only when installed."""

import numpy as np

from speechbrain_tpu.utils.importutils import LazyModule

FlagEmbedding = LazyModule("FlagEmbedding")


class BGEM3SentenceEmbeddings:
    """Dense sentence embeddings from the BGE-M3 model.

    ``__call__(sentences)`` -> (B, D) numpy array of dense vectors.
    """

    def __init__(self, source="BAAI/bge-m3", use_fp16=True, **kwargs):
        self.model = FlagEmbedding.BGEM3FlagModel(
            source, use_fp16=use_fp16, **kwargs
        )

    def __call__(self, sentences, batch_size=12, max_length=8192):
        out = self.model.encode(
            list(sentences), batch_size=batch_size, max_length=max_length
        )
        return np.asarray(out["dense_vecs"])
