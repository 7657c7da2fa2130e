"""SEP-28k preparation (reference recipes/SEP-28k): the release CSV
(SEP-28k_labels.csv) marks clip-level stuttering events; this indexer
emits JSON manifests with the majority event label, or synthesizes
tone-pattern clips for --debug runs / recipe tests."""

import csv
import json
import sys
from pathlib import Path

import numpy as np

EVENTS = ["NoStutter", "Block", "Prolongation", "SoundRep", "WordRep"]


def prepare_synthetic(data_folder, n_per_class=3, sample_rate=16000):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(0)
    entries = {"train": {}, "valid": {}}
    t = np.arange(sample_rate) / sample_rate
    for ei, ev in enumerate(EVENTS):
        for i in range(n_per_class):
            # event type -> distinctive interruption pattern
            gate = (np.sin(2 * np.pi * (1 + ei) * t) > -0.3).astype(
                np.float32
            )
            sig = 0.5 * np.sin(2 * np.pi * 240 * t).astype(np.float32)
            sig = sig * gate
            sig += 0.02 * rng.standard_normal(len(sig)).astype(np.float32)
            path = root / f"{ev}_{i}.wav"
            write_audio(str(path), sig, sample_rate)
            split = "valid" if i == n_per_class - 1 else "train"
            entries[split][f"{ev}_{i}"] = {
                "wav": str(path), "event": ev, "length": len(sig),
            }
    for split, items in entries.items():
        with open(root / f"{split}.json", "w") as f:
            json.dump(items, f, indent=2)


def prepare_sep28k(data_folder):
    """Index a SEP-28k release (SEP-28k_labels.csv + clips/)."""
    root = Path(data_folder)
    entries = {"train": {}, "valid": {}}
    with open(root / "SEP-28k_labels.csv", encoding="utf-8") as f:
        for i, row in enumerate(csv.DictReader(f)):
            counts = {
                ev: int(row.get(ev, 0) or 0)
                for ev in EVENTS[1:]
            }
            label = max(counts, key=counts.get)
            if counts[label] == 0:
                label = "NoStutter"
            clip = (
                root / "clips"
                / f"{row['Show']}_{row['EpId']}_{row['ClipId']}.wav"
            )
            split = "valid" if i % 10 == 9 else "train"
            entries[split][clip.stem] = {
                "wav": str(clip), "event": label, "length": 0,
            }
    for split, items in entries.items():
        with open(root / f"{split}.json", "w") as f:
            json.dump(items, f, indent=2)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_sep28k(folder)
