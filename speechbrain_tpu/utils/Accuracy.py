"""Accuracy metric (reference ``speechbrain/utils/Accuracy.py``). The
implementation lives in :mod:`speechbrain_tpu.utils.metric_stats`;
re-exported here to mirror the reference layout."""

from speechbrain_tpu.utils.metric_stats import Accuracy  # noqa: F401
from speechbrain_tpu.utils.metric_stats import Accuracy as AccuracyStats  # noqa: F401
