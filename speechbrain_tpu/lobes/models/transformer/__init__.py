"""Transformer model family: core encoder/decoder, ASR wrapper, Conformer,
Branchformer, LM heads."""
