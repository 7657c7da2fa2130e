"""Deprecated alias: diarization moved to
integrations.alignment.diarization (mirrors reference
processing/diarization.py:1)."""

import warnings

from speechbrain_tpu.integrations.alignment.diarization import *  # noqa: F401,F403

warnings.warn(
    "speechbrain_tpu.processing.diarization has moved to "
    "speechbrain_tpu.integrations.alignment.diarization",
    DeprecationWarning,
    stacklevel=2,
)
