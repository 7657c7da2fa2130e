"""Grapheme-to-phoneme models."""
