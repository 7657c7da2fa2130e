"""Branchformer (reference
``speechbrain/lobes/models/transformer/Branchformer.py``). The
implementation lives in
:mod:`speechbrain_tpu.lobes.models.Branchformer`; re-exported here to
mirror the reference layout."""

from speechbrain_tpu.lobes.models.Branchformer import *  # noqa: F401,F403
