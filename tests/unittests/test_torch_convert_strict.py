"""Unit tests for the fail-loudly pour semantics (ADVICE r2 medium):
unrecognized source keys must raise under strict=True rather than leave
target leaves at random init, and torch>=2.1 ``parametrizations.weight.
original0/1`` weight-norm naming must fuse like legacy weight_g/weight_v
(reference saves use both across torch versions)."""

import numpy as np
import pytest

from speechbrain_tpu.utils.torch_convert import (
    SKIP,
    fuse_weight_norm,
    pour_torch_keys,
)


def _variables():
    return {"params": {"lin": {"kernel": np.zeros((2, 3), np.float32)}}}


def _key_map(key):
    if key == "lin.weight":
        return ("params/lin/kernel", (1, 0))
    if key == "pe_buffer":
        return SKIP
    return None


def test_pour_strict_raises_on_unrecognized_source_key():
    state = {
        "lin.weight": np.ones((3, 2), np.float32),
        "renamed_upstream.weight": np.ones((3, 2), np.float32),
    }
    with pytest.raises(KeyError, match="unrecognized"):
        pour_torch_keys(state, _variables(), _key_map, strict=True)


def test_pour_nonstrict_warns_but_loads(caplog):
    state = {
        "lin.weight": np.full((3, 2), 2.0, np.float32),
        "renamed_upstream.weight": np.ones((3, 2), np.float32),
    }
    out = pour_torch_keys(state, _variables(), _key_map, strict=False)
    assert np.all(np.asarray(out["params"]["lin"]["kernel"]) == 2.0)


def test_pour_skip_sentinel_and_bookkeeping_keys_are_quietly_dropped():
    state = {
        "lin.weight": np.ones((3, 2), np.float32),
        "pe_buffer": np.zeros((5,), np.float32),
        "bn.num_batches_tracked": np.asarray(7),
    }
    out = pour_torch_keys(state, _variables(), _key_map, strict=True)
    assert np.all(np.asarray(out["params"]["lin"]["kernel"]) == 1.0)


def test_fuse_weight_norm_parametrizations_naming():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((4, 3, 5)).astype(np.float32)
    g = rng.standard_normal((4, 1, 1)).astype(np.float32)
    legacy = fuse_weight_norm({"c.weight_v": v, "c.weight_g": g})
    new = fuse_weight_norm(
        {
            "c.parametrizations.weight.original1": v,
            "c.parametrizations.weight.original0": g,
        }
    )
    np.testing.assert_allclose(legacy["c.weight"], new["c.weight"])
    assert "c.weight_v" not in legacy
    assert "c.parametrizations.weight.original1" not in new
