"""MEDIA preparation (reference recipes/MEDIA/media_prepare.py): the
ELRA MEDIA release ships XML dialogs with concept/value annotations;
this indexer expects pre-extracted per-split CSVs (wav, semantics,
transcript). Synthetic mode emits tone-coded hotel-booking concepts
for --debug runs / recipe tests."""

import csv
import json
import sys
from pathlib import Path

import numpy as np

CONCEPTS = ["chambre", "date", "ville", "prix"]
VALUES = ["simple", "double", "paris", "lyon"]


def prepare_synthetic(data_folder, n_utts=12, sample_rate=16000, seed=3):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}, "test": {}}
    for i in range(n_utts):
        # cyclic coverage: every concept/value (hence every character)
        # appears in the train split, so valid has no OOV characters
        c = i % len(CONCEPTS)
        v = i % len(VALUES)
        t = np.arange(int(0.25 * sample_rate)) / sample_rate
        sig = (
            0.4 * np.sin(2 * np.pi * (240 + 100 * c) * t)
            + 0.4 * np.sin(2 * np.pi * (900 + 140 * v) * t)
        ).astype(np.float32)
        sig += 0.01 * rng.standard_normal(len(sig)).astype(np.float32)
        path = root / f"media_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        semantics = f"<{CONCEPTS[c]}> {VALUES[v]} </{CONCEPTS[c]}>"
        split = ("valid" if i % 6 == 4 else "test" if i % 6 == 5
                 else "train")
        manifests[split][f"media_{i}"] = {
            "wav": str(path),
            "semantics": semantics,
            "transcript": f"{CONCEPTS[c]} {VALUES[v]}",
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def prepare_media(data_folder, save_folder=None):
    """Index pre-extracted MEDIA CSVs ({train,devel,test}.csv with
    wav, semantics, transcript columns)."""
    root = Path(data_folder)
    save = Path(save_folder or data_folder)
    save.mkdir(parents=True, exist_ok=True)
    for split in ("train", "valid", "test"):
        f = root / f"{split}.csv"
        if not f.exists():
            continue
        manifest = {}
        with open(f, encoding="utf-8") as fh:
            for i, row in enumerate(csv.DictReader(fh)):
                manifest[f"{split}_{i}"] = {
                    "wav": str(root / row["wav"]),
                    "semantics": row["semantics"],
                    "transcript": row.get("transcript", ""),
                    "length": 0.0,
                }
        with open(save / f"{split}.json", "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_media(folder)
