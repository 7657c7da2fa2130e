"""Doctest collection config (loaded only under pytest).

Like the reference's CI, doctests run on the CPU backend: the
experimental TPU tunnel flakes (UNIMPLEMENTED backend errors) under
long many-module sessions, and doctest outputs assume fp32 numerics.

Modules gated on external packages that are not bundled in this
environment (spacy/flair/FlagEmbedding/vocos/speechtokenizer/
wavtokenizer) are skipped — pytest's doctest collector inspects module
attributes, which would trigger their lazy imports."""

import jax

jax.config.update("jax_platforms", "cpu")

collect_ignore = [
    "integrations/nlp/spacy_pipeline.py",
    "integrations/nlp/flair_embeddings.py",
    "integrations/nlp/flair_tagger.py",
    "integrations/nlp/bgeM3_embeddings.py",
    "integrations/huggingface/vocos.py",
    "integrations/audio_tokenizers/speechtokenizer_interface.py",
    "integrations/audio_tokenizers/wavtokenizer_interface.py",
]
