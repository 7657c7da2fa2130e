"""Multi-host semantics tested with TWO real jax.distributed CPU
processes (the analogue of the reference's gloo + mp.spawn tests,
tests/unittests/test_distributed.py:12-48): run_on_main, barrier,
rank-0 decision broadcast, all-reduce, and DistributedSamplerWrapper
shard disjointness."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]

WORKER = r'''
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from speechbrain_tpu.parallel.distributed import (
    ddp_all_reduce,
    ddp_barrier,
    ddp_broadcast,
    ddp_init_group,
    if_main_process,
    rank,
    run_on_main,
    world_size,
)

ddp_init_group()
out_dir = sys.argv[1]
r, n = rank(), world_size()
assert n == 2, f"expected 2 processes, got {n}"

# run_on_main: only rank 0 writes the marker; everyone sees it after
marker = os.path.join(out_dir, "prepared.txt")
run_on_main(lambda: open(marker, "w").write("by rank 0"))
assert os.path.exists(marker), f"rank {r} missed run_on_main barrier"

# rank-0 decision broadcast (the intra-epoch ckpt idiom, core.py)
import numpy as np
decision = np.asarray(1234 if if_main_process() else 0)
agreed = int(ddp_broadcast(decision))
assert agreed == 1234, (r, agreed)

# all-reduce
total = int(ddp_all_reduce(np.asarray(r + 1), op="sum"))
assert total == 3, (r, total)

# distributed Gaussian-statistic combine (InputNormalization's
# multi-host running stats; reference processing/features.py:1147)
from speechbrain_tpu.processing.features import (
    combine_gaussian_statistics_distributed,
)

local = np.arange(10, dtype=np.float64) + 10 * r  # rank 0: 0..9, rank 1: 10..19
cnt, mean, var = combine_gaussian_statistics_distributed(
    (len(local), local.mean(), local.var())
)
full = np.arange(20, dtype=np.float64)
assert cnt == 20 and abs(float(mean) - full.mean()) < 1e-6
assert abs(float(var) - full.var()) < 1e-6, (float(var), full.var())

# DistributedSamplerWrapper shards a seeded sampler disjointly
from speechbrain_tpu.dataio.sampler import (
    DistributedSamplerWrapper,
    ReproducibleRandomSampler,
)

base = ReproducibleRandomSampler(list(range(20)), seed=7)
shard = DistributedSamplerWrapper(base, rank=r, num_replicas=n)
shard.set_epoch(0)
indices = list(shard)
with open(os.path.join(out_dir, f"shard_{r}.json"), "w") as f:
    json.dump(indices, f)
ddp_barrier()
print(f"rank {r} OK")
'''


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_semantics(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["JAX_PLATFORMS"] = "cpu"
        env["TF_CPP_MIN_LOG_LEVEL"] = "3"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    # shard disjointness + full coverage
    shards = [
        json.load(open(tmp_path / f"shard_{r}.json")) for r in range(2)
    ]
    assert not set(shards[0]) & set(shards[1])
    assert sorted(shards[0] + shards[1]) == sorted(set(shards[0] + shards[1]))
    assert len(shards[0]) == len(shards[1])
