"""BERTScore metric (reference ``speechbrain/utils/bertscore.py``). The
implementation lives in :mod:`speechbrain_tpu.utils.semdist`;
re-exported here to mirror the reference layout."""

from speechbrain_tpu.utils.semdist import BertScoreStats  # noqa: F401
