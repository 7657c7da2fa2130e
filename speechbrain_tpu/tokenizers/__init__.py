"""Tokenizers: BPE/char with a SentencePiece-compatible API."""

from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece  # noqa: F401
