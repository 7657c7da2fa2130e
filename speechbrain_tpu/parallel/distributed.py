"""Multi-host coordination helpers.

Capability parity with the reference's ``speechbrain/utils/distributed.py``
(run_on_main :92, run_once_per_node :157, main_process_only :305,
once_per_node :326, ddp_barrier :357, ddp_broadcast :387, ddp_all_reduce
:413, ddp_init_group :441), mapped to the JAX process model:

* rank        -> jax.process_index()
* world size  -> jax.process_count()
* barrier     -> multihost_utils.sync_global_devices
* broadcast   -> multihost_utils.broadcast_one_to_all
* init_process_group -> jax.distributed.initialize (once per host)

In-graph gradient reduction needs none of this — it's XLA collectives
from sharded jit. These helpers coordinate HOST-side work: data prep,
checkpoint writes, logging.
"""

import functools
import os

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)

MAIN_PROC_ONLY = 0


def _jax():
    import jax

    return jax


def rank():
    """Global process index (0 on single host)."""
    try:
        return _jax().process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", 0))


def world_size():
    """Number of processes in the job (1 on single host)."""
    try:
        return _jax().process_count()
    except Exception:
        return 1


def if_main_process():
    """True on process 0 (reference distributed.py:40)."""
    return rank() == 0


def ddp_barrier():
    """Synchronize all hosts (no-op single-host; reference :357)."""
    if world_size() > 1 and MAIN_PROC_ONLY == 0:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sb_tpu_barrier")


def ddp_broadcast(value, src=0):
    """Broadcast a (pytree of) array(s) from process 0 (reference :387)."""
    if world_size() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value)


def ddp_all_reduce(value, op="sum"):
    """All-reduce a host value across processes (reference :413)."""
    if world_size() == 1:
        return value
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(value)
    if op == "sum":
        return gathered.sum(axis=0)
    if op == "max":
        return gathered.max(axis=0)
    if op == "min":
        return gathered.min(axis=0)
    if op == "avg" or op == "mean":
        return gathered.mean(axis=0)
    raise ValueError(f"Unknown op {op}")


def run_on_main(
    func,
    args=None,
    kwargs=None,
    post_func=None,
    post_args=None,
    post_kwargs=None,
    run_post_on_main=False,
):
    """Run func on process 0, barrier, then post_func elsewhere
    (reference :92). Data-prep idiom:

    >>> run_on_main(lambda: None)
    """
    args = args or []
    kwargs = kwargs or {}
    post_args = post_args or []
    post_kwargs = post_kwargs or {}
    main_process_only(func)(*args, **kwargs)
    ddp_barrier()
    if post_func is not None:
        if run_post_on_main or not if_main_process():
            post_func(*post_args, **post_kwargs)
    ddp_barrier()


def main_process_only(function):
    """Decorator: run only on process 0; suppress inner barriers
    (reference :305)."""

    @functools.wraps(function)
    def main_proc_wrapped_func(*args, **kwargs):
        global MAIN_PROC_ONLY
        MAIN_PROC_ONLY += 1
        result = function(*args, **kwargs) if if_main_process() else None
        MAIN_PROC_ONLY -= 1
        if MAIN_PROC_ONLY == 0:
            ddp_barrier()
        return result

    return main_proc_wrapped_func


def run_once_per_node(func):
    """Run on the first process of each node (reference :157).

    Node identity comes from jax.local_devices ownership; with one process
    per host this is every process whose local rank is 0.
    """

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        local_rank = int(os.environ.get("LOCAL_RANK", 0))
        if local_rank == 0:
            return func(*args, **kwargs)
        return None

    return wrapper


once_per_node = run_once_per_node  # decorator alias matching the reference


def ddp_init_group(run_opts=None):
    """Initialize multi-host JAX if a coordinator is configured
    (reference :441 -> jax.distributed.initialize)."""
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single host
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    logger.info(
        "Initialized JAX distributed: process %d / %d",
        jax.process_index(),
        jax.process_count(),
    )
