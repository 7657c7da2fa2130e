"""Version-specific workarounds (reference
``speechbrain/utils/_workarounds.py``). The reference patches torch
CyclicLR checkpoint quirks; this stack has no equivalent breakages —
kept as the registry for any future jax/flax version shims."""

WORKAROUNDS = {}
