"""Fluent Speech Commands preparation (reference
recipes/fluent-speech-commands/prepare.py): index the FSC release's
CSVs into JSON manifests with serialized {action, object, location}
semantics; or emit a synthetic tone-command dataset for --debug runs."""

import csv
import json
import sys
from pathlib import Path

import numpy as np

ACTIONS = ["activate", "deactivate", "increase", "decrease"]
OBJECTS = ["lights", "music", "heat", "volume"]
LOCATIONS = ["none", "kitchen", "bedroom"]


def prepare_synthetic(data_folder, n_utts=12, sample_rate=16000, seed=1):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}, "test": {}}
    for i in range(n_utts):
        a = int(rng.integers(0, len(ACTIONS)))
        o = int(rng.integers(0, len(OBJECTS)))
        loc = int(rng.integers(0, len(LOCATIONS)))
        t = np.arange(int(0.25 * sample_rate)) / sample_rate
        sig = (
            0.4 * np.sin(2 * np.pi * (220 + 90 * a) * t)
            + 0.4 * np.sin(2 * np.pi * (800 + 120 * o) * t)
            + 0.2 * np.sin(2 * np.pi * (1800 + 200 * loc) * t)
        ).astype(np.float32)
        sig += 0.01 * rng.standard_normal(len(sig)).astype(np.float32)
        path = root / f"fsc_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        semantics = (
            f"{{'action': '{ACTIONS[a]}', 'object': '{OBJECTS[o]}', "
            f"'location': '{LOCATIONS[loc]}'}}"
        )
        split = ("valid" if i % 6 == 4 else "test" if i % 6 == 5
                 else "train")
        manifests[split][f"fsc_{i}"] = {
            "wav": str(path),
            "semantics": semantics,
            "transcript": f"{ACTIONS[a]} {OBJECTS[o]} {LOCATIONS[loc]}",
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def prepare_fsc(data_folder, save_folder=None):
    """Index a real FSC release (data/{train,valid,test}_data.csv)."""
    root = Path(data_folder)
    save = Path(save_folder or data_folder)
    save.mkdir(parents=True, exist_ok=True)
    for split in ("train", "valid", "test"):
        manifest = {}
        with open(root / "data" / f"{split}_data.csv",
                  encoding="utf-8") as f:
            for row in csv.DictReader(f):
                semantics = (
                    f"{{'action': '{row['action']}', "
                    f"'object': '{row['object']}', "
                    f"'location': '{row['location']}'}}"
                )
                utt = Path(row["path"]).stem
                manifest[utt] = {
                    "wav": str(root / row["path"]),
                    "semantics": semantics,
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
        prepare_fsc(folder)
