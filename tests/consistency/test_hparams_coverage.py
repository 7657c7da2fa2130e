"""Every reference hparams config must exist here — same path
(case-insensitive) or through the committed rename map
(hparams_rename_map.csv), whose targets must exist on disk. This pins
the recipe-config surface to the reference's 238 configs with an
auditable diff (VERDICT r4 item 7)."""

import csv
import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
REF = Path("/root/reference/recipes")
MAP = Path(__file__).parent / "hparams_rename_map.csv"

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout unavailable"
)


def _hparams_under(root):
    out = set()
    for p in root.rglob("*.yaml"):
        rel = p.relative_to(root)
        if "hparams" in rel.parts or rel.name == "hparams.yaml":
            if "results" in rel.parts:
                continue
            out.add(str(rel))
    return out


def test_every_reference_hparams_has_a_counterpart():
    ref = _hparams_under(REF)
    repo = _hparams_under(REPO / "recipes")
    repo_fold = {p.lower() for p in repo}
    with open(MAP, newline="") as f:
        renames = {r["ref_path"]: r["repo_path"] for r in csv.DictReader(f)}

    missing, broken = [], []
    for p in sorted(ref):
        if p in repo or p.lower() in repo_fold:
            continue
        tgt = renames.get(p)
        if tgt is None:
            missing.append(p)
        elif tgt.lower() not in repo_fold:
            broken.append((p, tgt))
    assert not broken, f"rename map points at missing files: {broken}"
    assert not missing, (
        f"{len(missing)} reference configs have no counterpart and no "
        f"rename-map entry: {missing}"
    )


def test_rename_map_entries_are_real_reference_paths():
    ref = _hparams_under(REF)
    with open(MAP, newline="") as f:
        rows = list(csv.DictReader(f))
    stale = [r["ref_path"] for r in rows if r["ref_path"] not in ref]
    assert not stale, f"rename map has stale reference paths: {stale}"
    # renames must be RENAMES, not self-maps of existing paths
    repo_fold = {
        p.lower() for p in _hparams_under(REPO / "recipes")
    }
    pointless = [
        r["ref_path"] for r in rows if r["ref_path"].lower() in repo_fold
    ]
    assert not pointless, (
        f"rename map entries whose ref path exists verbatim: {pointless}"
    )
