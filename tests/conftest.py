"""Test configuration: run the suite on the JAX CPU backend with 8 virtual
devices, so multi-chip sharding logic is exercised without TPU hardware
(the analogue of the reference's gloo + mp.spawn distributed tests,
reference tests/unittests/test_distributed.py:12-48).

Note: in this image the axon TPU plugin ignores the JAX_PLATFORMS env var,
so we must force the platform through jax.config before any jax use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tmp_ckpt_dir(tmp_path):
    d = tmp_path / "ckpts"
    d.mkdir()
    return d
