"""Discrete audio codec lobes (DAC)."""
