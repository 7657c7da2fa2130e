"""Decoder integrations: word-level n-gram LM scorer for CTC beam search."""

from speechbrain_tpu.integrations.decoders.kenlm_scorer import (  # noqa: F401
    NgramLMState,
    NgramScorer,
    KenlmScorer,
    load_unigram_set_from_arpa,
)
