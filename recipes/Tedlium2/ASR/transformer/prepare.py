"""Tedlium-2 preparation (reference recipes/Tedlium2/prepare.py): sph +
stm -> JSON manifests, or a synthetic talk-like dataset for --debug runs
/ recipe tests."""

import json
import sys
from pathlib import Path

import numpy as np

WORDS = ["the", "talk", "of", "science", "and", "future"]


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
            np.sin(2 * np.pi * (220 + 90 * w) * np.arange(1600) / sample_rate)
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


def prepare_tedlium(data_folder):
    """Index the TEDLIUM release 2 layout (stm transcripts; audio is sph
    — convert to wav beforehand, e.g. with sox, and point `wav` there)."""
    root = Path(data_folder)
    for split_in, split_out in (("train", "train"), ("dev", "valid"),
                                ("test", "test")):
        stm_dir = root / split_in / "stm"
        if not stm_dir.exists():
            continue
        items = {}
        for stm in sorted(stm_dir.glob("*.stm")):
            for k, line in enumerate(stm.read_text().splitlines()):
                parts = line.split(None, 6)
                if len(parts) < 7 or parts[2] == "inter_segment_gap":
                    continue
                talk, _, _, start, end, _, words = parts
                items[f"{talk}_{k}"] = {
                    "wav": str(root / split_in / "wav" / f"{talk}.wav"),
                    "start": float(start), "stop": float(end),
                    "words": words.lower(), "length": 0,
                }
        with open(root / f"{split_out}.json", "w") as f:
            json.dump(items, f, indent=2)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_tedlium(folder)
