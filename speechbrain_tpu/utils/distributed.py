"""Distributed helpers (reference ``speechbrain/utils/distributed.py``).
The TPU-native implementation (jax.distributed + multihost_utils) lives
in :mod:`speechbrain_tpu.parallel.distributed`; re-exported here to
mirror the reference layout."""

from speechbrain_tpu.parallel.distributed import *  # noqa: F401,F403
from speechbrain_tpu.parallel.distributed import (  # noqa: F401
    ddp_barrier,
    ddp_init_group,
    main_process_only,
    run_on_main,
)
