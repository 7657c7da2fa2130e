"""NLP integrations: BLEU, spacy/flair pipelines, BGE-M3 embeddings.

BGE-M3 runs natively on the Flax bridge (no FlagEmbedding needed) and
BLEU has a native implementation in :mod:`speechbrain_tpu.utils.bleu`.
External packages (spacy, flair) are not bundled; those wrappers raise
informative ImportErrors when absent.
"""

from speechbrain_tpu.integrations.nlp.bleu import BLEUStats  # noqa: F401
