"""Loquacious preparation (reference recipes/Loquacious): real-layout
indexer -> JSON manifests, or a synthetic dataset for --debug
runs / recipe tests."""

import re  # noqa: F401  (used by some indexers)

import json
import sys
from pathlib import Path

import numpy as np

WORDS = ['varied', 'accents', 'speech', 'large', 'open', 'set']


def prepare_synthetic(data_folder, n_utt=10, sample_rate=16000):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(0)
    entries = {"train": {}, "valid": {}}
    for i in range(n_utt):
        # cyclic word choice: every word (hence every character) appears
        # in the train split, so the valid split has no OOV characters
        words = [(i + j) % len(WORDS) for j in range(3)]
        sig = np.concatenate([
            np.sin(2 * np.pi * (220 + 90 * w) * np.arange(6400) / sample_rate)
            for w in words
        ]).astype(np.float32)
        path = root / f"talk{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utt - 2 else "train"
        entries[split][f"talk{i}"] = {
            "wav": str(path),
            "words": " ".join(WORDS[w] for w in words),
            "length": len(sig),
        }
    for split, items in entries.items():
        with open(root / f"{split}.json", "w") as f:
            json.dump(items, f, indent=2)
    return str(root / "train.json"), str(root / "valid.json")


def prepare_loquacious(data_folder):
    """Index a Loquacious download from per-split jsonl manifests
    ({train,dev,test}.jsonl with {"wav"|"audio_filepath", "text"})."""
    root = Path(data_folder)
    for split_in, split_out in (("train", "train"), ("dev", "valid"),
                                ("test", "test")):
        f = root / f"{split_in}.jsonl"
        if not f.exists():
            continue
        items = {}
        with open(f, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                e = json.loads(line)
                items[f"{split_in}_{i}"] = {
                    "wav": str(root / e.get("wav", e.get("audio_filepath"))),
                    "words": e["text"].lower(), "length": 0,
                }
        with open(root / f"{split_out}.json", "w") as fh:
            json.dump(items, fh, indent=2)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_loquacious(folder)
