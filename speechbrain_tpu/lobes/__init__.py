"""Lobes: composed feature extractors and full model architectures."""
