"""Doctest collection config: modules gated on external packages that
are not bundled in this environment (spacy/flair/FlagEmbedding/vocos/
speechtokenizer/wavtokenizer) are skipped — pytest's doctest collector
inspects module attributes, which would trigger their lazy imports."""

collect_ignore = [
    "integrations/nlp/spacy_pipeline.py",
    "integrations/nlp/flair_embeddings.py",
    "integrations/nlp/flair_tagger.py",
    "integrations/nlp/bgeM3_embeddings.py",
    "integrations/huggingface/vocos.py",
    "integrations/audio_tokenizers/speechtokenizer_interface.py",
    "integrations/audio_tokenizers/wavtokenizer_interface.py",
]
