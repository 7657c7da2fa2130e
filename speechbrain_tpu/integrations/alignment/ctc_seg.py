"""CTC segmentation (reference
``speechbrain/integrations/alignment/ctc_seg.py``). The TPU-native
implementation lives in :mod:`speechbrain_tpu.alignment.ctc_segmentation`;
re-exported here to mirror the reference layout."""

from speechbrain_tpu.alignment.ctc_segmentation import *  # noqa: F401,F403
