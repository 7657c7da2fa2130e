"""Tests for the Checkpointer, hyperyaml config loader, epoch loop."""

import io
import time

import numpy as np
import pytest

from speechbrain_tpu.utils.checkpoints import (
    Checkpointer,
    PytreeRef,
    average_checkpoints,
)
from speechbrain_tpu.utils.epoch_loop import EpochCounter, EpochCounterWithStopper
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


def test_pytree_roundtrip(tmp_path):
    params = {"layer": {"w": np.ones((3, 2), np.float32), "b": np.zeros(2, np.float32)}}
    ref = PytreeRef(params)
    ckpt = Checkpointer(tmp_path, {"params": ref})
    ckpt.save_checkpoint(meta={"loss": 1.0})
    ref.tree = {"layer": {"w": np.zeros((3, 2), np.float32), "b": np.ones(2, np.float32)}}
    loaded = ckpt.recover_if_possible()
    assert loaded is not None
    assert np.allclose(ref.tree["layer"]["w"], 1.0)
    assert np.allclose(ref.tree["layer"]["b"], 0.0)


def test_find_checkpoint_minmax(tmp_path):
    ref = PytreeRef({"x": np.zeros(1)})
    ckpt = Checkpointer(tmp_path, {"params": ref})
    ckpt.save_checkpoint(meta={"WER": 10.0}, name="a")
    time.sleep(0.01)
    ckpt.save_checkpoint(meta={"WER": 5.0}, name="b")
    best = ckpt.find_checkpoint(min_key="WER")
    assert best.meta["WER"] == 5.0
    worst = ckpt.find_checkpoint(max_key="WER")
    assert worst.meta["WER"] == 10.0
    recent = ckpt.find_checkpoint()
    assert recent.path.name.endswith("b")


def test_save_and_keep_only(tmp_path):
    ref = PytreeRef({"x": np.zeros(1)})
    ckpt = Checkpointer(tmp_path, {"params": ref})
    for i in range(5):
        ckpt.save_and_keep_only(meta={"loss": float(i)}, num_to_keep=2, min_keys=["loss"])
        time.sleep(0.01)
    remaining = ckpt.list_checkpoints()
    # 2 most recent + 2 best-loss (overlapping sets allowed)
    losses = sorted(c.meta["loss"] for c in remaining)
    assert 0.0 in losses and 1.0 in losses
    assert len(remaining) <= 4


def test_average_checkpoints(tmp_path):
    ref = PytreeRef({"w": np.zeros(2, np.float32)})
    ckpt = Checkpointer(tmp_path, {"params": ref})
    for v in (1.0, 3.0):
        ref.tree = {"w": np.full(2, v, np.float32)}
        ckpt.save_checkpoint(name=f"v{v}")
    ckpts = ckpt.list_checkpoints()
    avg = average_checkpoints(ckpts, "params", target=ref.tree)
    assert np.allclose(avg["w"], 2.0)


def test_epoch_counter_resume(tmp_path):
    ec = EpochCounter(5)
    seen = []
    for e in ec:
        seen.append(e)
        if e == 2:
            break
    path = tmp_path / "epoch.ckpt"
    ec._save(path)
    ec2 = EpochCounter(5)
    ec2._recover(path, end_of_epoch=True)
    assert next(ec2) == 3
    ec3 = EpochCounter(5)
    ec3._recover(path, end_of_epoch=False)
    assert next(ec3) == 2  # redo interrupted epoch


def test_epoch_counter_with_stopper():
    ec = EpochCounterWithStopper(limit=10, limit_to_stop=2, limit_warmup=0, direction="min")
    metrics = [5.0, 4.0, 4.5, 4.6, 4.7, 4.8]
    ran = []
    for e in ec:
        ran.append(e)
        if e <= len(metrics):
            ec.update_metric(metrics[e - 1])
    assert len(ran) < 10  # stopped early


# ---------------------------------------------------------------------------
# hyperyaml
# ---------------------------------------------------------------------------

def test_hyperyaml_refs_and_arithmetic():
    out = load_hyperpyyaml(io.StringIO("""
n_fft: 400
half: !ref <n_fft> / 2
folder: results/exp1
save: !ref <folder>/save
nested:
  a: 3
deep: !ref <nested[a]>
"""))
    assert out["half"] == 200.0
    assert out["save"] == "results/exp1/save"
    assert out["deep"] == 3


def test_hyperyaml_new_and_shared_ref():
    out = load_hyperpyyaml(io.StringIO("""
enc: !new:collections.Counter
both:
  - !ref <enc>
  - !ref <enc>
"""))
    assert out["both"][0] is out["both"][1] is out["enc"]


def test_hyperyaml_name_partial():
    out = load_hyperpyyaml(io.StringIO("""
fn: !name:operator.add
"""))
    assert out["fn"](2, 3) == 5


def test_hyperyaml_include_with_parent_scope_overrides(tmp_path):
    """``!include:models/x.yaml`` loads a sub-scope whose overrides
    resolve against the parent (the reference recipe idiom, ref
    recipes/WHAMandWHAMR/enhancement/hparams/
    cnntransformer-wham-DM.yaml:141)."""
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "sub.yaml").write_text(
        "n_fft: !PLACEHOLDER\nwidth: 8\nmodel: !ref <n_fft> * <width>\n"
    )
    main = tmp_path / "main.yaml"
    main.write_text(
        "n_fft: 64\n"
        "MaskNet: !include:models/sub.yaml\n"
        "  n_fft: !ref <n_fft>\n"
        "use: !ref <MaskNet[model]>\n"
    )
    with open(main, encoding="utf-8") as f:
        out = load_hyperpyyaml(f)
    assert out["MaskNet"]["model"] == 512
    assert out["use"] == 512


def test_hyperyaml_apply():
    out = load_hyperpyyaml(io.StringIO("""
val: !apply:operator.mul [3, 4]
"""))
    assert out["val"] == 12


def test_hyperyaml_placeholder_and_overrides():
    yaml_str = """
data_folder: !PLACEHOLDER
lr: 1.0
"""
    with pytest.raises(ValueError):
        load_hyperpyyaml(io.StringIO(yaml_str))
    out = load_hyperpyyaml(io.StringIO(yaml_str), overrides={"data_folder": "/data", "lr": 0.1})
    assert out["data_folder"] == "/data"
    assert out["lr"] == 0.1


def test_hyperyaml_new_with_ref_args():
    out = load_hyperpyyaml(io.StringIO("""
n: 5
counter: !new:collections.Counter
  a: !ref <n>
"""))
    assert out["counter"]["a"] == 5


def test_hyperyaml_tuple():
    out = load_hyperpyyaml(io.StringIO("shape: !tuple (3, 4)\n"))
    assert out["shape"] == (3, 4)
