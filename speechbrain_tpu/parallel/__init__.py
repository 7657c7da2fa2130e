"""Parallelism: device meshes, sharded train steps, multi-host helpers."""

from speechbrain_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from speechbrain_tpu.parallel.distributed import (  # noqa: F401
    ddp_barrier,
    if_main_process,
    main_process_only,
    run_on_main,
)
