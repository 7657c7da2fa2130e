"""Recipe-test harness (the analogue of the reference's
tests/recipes/*.csv + tests/utils/recipe_tests.py): every row of
recipes.csv whose flags don't start with SKIP is run end-to-end in debug
mode — the recipe must self-provision synthetic data, train
debug_batches steps, validate, and checkpoint with rc=0."""

import csv
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
CSV = Path(__file__).parent / "recipes.csv"


def _rows():
    with open(CSV) as f:
        for row in csv.DictReader(f):
            marks = []
            if row["test_debug_flags"].startswith("SKIP"):
                marks.append(
                    pytest.mark.skip(reason=row["test_debug_flags"][5:])
                )
            rid = row["recipe_dir"]
            if row["script"] != "train.py":
                # distinguish sibling scripts (train_with_wav2vec.py,
                # train_spk.py, ...) so -k can target them
                rid += ":" + row["script"][:-3]
            yield pytest.param(row, id=rid, marks=marks)


def test_recipe_flags_are_well_formed():
    """Guard flag INTEGRITY, not just row presence: an unquoted comma in
    a list-valued flag silently truncates the row at CSV parse time (it
    happened — commit fdaa427), so the row runs with fewer overrides
    than intended. Every parsed row must carry exactly the four fields,
    every flag must look like ``--name[=value]``, and nothing may leak
    into a fifth column."""
    with open(CSV, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        assert header == ["recipe_dir", "script", "hparams",
                          "test_debug_flags"]
        for lineno, row in enumerate(reader, start=2):
            assert len(row) == 4, (
                f"line {lineno}: {len(row)} fields (unquoted comma?): {row}"
            )
            flags = row[3]
            if flags.startswith("SKIP"):
                continue
            for tok in flags.split():
                assert tok.startswith("--"), (
                    f"line {lineno}: malformed flag {tok!r} in {flags!r}"
                )
            assert "--debug" in flags.split(), (
                f"line {lineno}: debug run must pass --debug: {flags!r}"
            )


def test_all_recipes_registered():
    """Every recipe train script on disk must have a CSV row
    (the reference's tests/consistency/test_recipe.py contract)."""
    with open(CSV) as f:
        registered = {
            (r["recipe_dir"], r["script"]) for r in csv.DictReader(f)
        }
    on_disk = set()
    for script in (REPO / "recipes").rglob("train*.py"):
        rel = script.relative_to(REPO)
        if "results" in rel.parts:  # experiment-dir copies of train.py
            continue
        on_disk.add((str(rel.parent), rel.name))
    missing = on_disk - registered
    assert not missing, f"recipes missing from recipes.csv: {missing}"


@pytest.mark.parametrize("row", _rows())
def test_recipe_debug_run(row, tmp_path):
    recipe_dir = REPO / row["recipe_dir"]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = (
        [sys.executable, row["script"], row["hparams"],
         f"--data_folder={tmp_path}/data",
         f"--output_folder={tmp_path}/out"]
        + row["test_debug_flags"].split()
    )
    proc = subprocess.run(
        cmd, cwd=recipe_dir, env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"{row['recipe_dir']} failed:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-4000:]}"
    )
    assert (tmp_path / "out" / "save").exists()  # checkpoint written
