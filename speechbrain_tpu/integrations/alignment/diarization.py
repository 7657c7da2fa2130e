"""Spectral-clustering diarization (reference
``speechbrain/integrations/alignment/diarization.py``). The TPU-native
implementation (affinity, p-pruning, eigengap, spectral embedding,
jitted k-means) lives in :mod:`speechbrain_tpu.alignment.diarization`;
re-exported here to mirror the reference layout."""

from speechbrain_tpu.alignment.diarization import *  # noqa: F401,F403
from speechbrain_tpu.alignment.diarization import (  # noqa: F401
    do_spec_clustering,
    get_affinity,
    merge_ssegs_same_speaker,
    p_pruning,
    spectral_embedding,
    write_rttm,
)
