"""NLP integrations: BLEU, spacy/flair pipelines, BGE-M3 embeddings.

External packages (spacy, flair, FlagEmbedding, sacrebleu) are not
bundled; wrappers raise informative ImportErrors when absent. BLEU has
a native implementation in :mod:`speechbrain_tpu.utils.bleu`.
"""

from speechbrain_tpu.integrations.nlp.bleu import BLEUStats  # noqa: F401
