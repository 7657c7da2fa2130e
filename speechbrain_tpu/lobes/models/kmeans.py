"""Deprecated alias: kmeans moved to integrations.audio_tokenizers.kmeans
(mirrors reference lobes/models/kmeans.py:1)."""

import warnings

from speechbrain_tpu.integrations.audio_tokenizers.kmeans import *  # noqa: F401,F403

warnings.warn(
    "speechbrain_tpu.lobes.models.kmeans has moved to "
    "speechbrain_tpu.integrations.audio_tokenizers.kmeans",
    DeprecationWarning,
    stacklevel=2,
)
