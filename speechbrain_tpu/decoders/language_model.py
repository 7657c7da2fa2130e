"""Deprecated alias: the word-LM scorer moved to
integrations.decoders.kenlm_scorer (mirrors reference
decoders/language_model.py:1)."""

import warnings

from speechbrain_tpu.integrations.decoders.kenlm_scorer import *  # noqa: F401,F403

warnings.warn(
    "speechbrain_tpu.decoders.language_model has moved to "
    "speechbrain_tpu.integrations.decoders.kenlm_scorer",
    DeprecationWarning,
    stacklevel=2,
)
