"""Optional third-party integrations (gated on their packages):
HuggingFace transformers (Flax models), k2-style n-gram decoding via the
pure-python lm/ package, native transducer loss (nnet.transducer_loss
replaces the reference's numba kernel)."""
