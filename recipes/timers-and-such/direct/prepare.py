"""Timers and Such preparation (reference
recipes/timers-and-such/prepare.py): index the release CSVs into JSON
manifests with serialized intent/slot semantics; or emit a synthetic
tone-command dataset for --debug runs."""

import csv
import json
import sys
from pathlib import Path

import numpy as np

INTENTS = ["SetTimer", "SetAlarm", "SimpleMath", "UnitConversion"]


def prepare_synthetic(data_folder, n_utts=12, sample_rate=16000, seed=2):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}, "test": {}}
    for i in range(n_utts):
        k = int(rng.integers(0, len(INTENTS)))
        num = int(rng.integers(1, 60))
        t = np.arange(int(0.25 * sample_rate)) / sample_rate
        sig = (
            0.5 * np.sin(2 * np.pi * (260 + 110 * k) * t)
            + 0.3 * np.sin(2 * np.pi * (900 + 10 * num) * t)
        ).astype(np.float32)
        sig += 0.01 * rng.standard_normal(len(sig)).astype(np.float32)
        path = root / f"tas_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        semantics = f"{{'intent': '{INTENTS[k]}', 'number': {num}}}"
        split = ("valid" if i % 6 == 4 else "test" if i % 6 == 5
                 else "train")
        manifests[split][f"tas_{i}"] = {
            "wav": str(path),
            "semantics": semantics,
            "transcript": f"{INTENTS[k]} {num}",
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def prepare_timers_and_such(data_folder, save_folder=None):
    """Index a real Timers-and-Such release ({train-real,dev-real,
    test-real}.csv + audio)."""
    root = Path(data_folder)
    save = Path(save_folder or data_folder)
    save.mkdir(parents=True, exist_ok=True)
    split_map = {
        "train": "train-real", "valid": "dev-real", "test": "test-real"
    }
    for split, name in split_map.items():
        manifest = {}
        with open(root / f"{name}.csv", encoding="utf-8") as f:
            for row in csv.DictReader(f):
                utt = Path(row["path"]).stem
                manifest[utt] = {
                    "wav": str(root / row["path"]),
                    "semantics": row.get("semantics", ""),
                    "transcript": row.get("transcription", ""),
                    "length": 0.0,
                }
        with open(save / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_timers_and_such(folder)
