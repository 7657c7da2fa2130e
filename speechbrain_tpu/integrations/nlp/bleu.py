"""BLEU metric (reference ``speechbrain/integrations/nlp/bleu.py`` wraps
sacrebleu). The framework ships a native corpus-BLEU in
:mod:`speechbrain_tpu.utils.bleu`; re-exported here to mirror the
reference layout."""

from speechbrain_tpu.utils.bleu import BLEUStats, corpus_bleu  # noqa: F401
