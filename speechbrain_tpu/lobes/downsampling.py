"""Downsampling lobes (reference ``speechbrain/lobes/downsampling.py``).
The implementations live in
:mod:`speechbrain_tpu.lobes.models.downsampling`; re-exported here to
mirror the reference layout."""

from speechbrain_tpu.lobes.models.downsampling import *  # noqa: F401,F403
