"""VoiceBank ASR preparation (reference recipes/Voicebank/voicebank_prepare.py):
indexes noisy wav + transcript pairs, or a synthetic noisy letter-tone
dataset for --debug runs / recipe tests."""

import csv
import json
import sys
from pathlib import Path

import numpy as np

LETTERS = ["a", "e", "i", "o", "u"]


def prepare_synthetic(data_folder, n_utt=10, sample_rate=16000):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(0)
    entries = {"train": {}, "valid": {}}
    for i in range(n_utt):
        letters = rng.integers(0, len(LETTERS), size=3)
        sig = np.concatenate([
            np.sin(2 * np.pi * (250 + 130 * c) * np.arange(1600) / sample_rate)
            for c in letters
        ]).astype(np.float32)
        sig = sig + 0.1 * rng.standard_normal(len(sig)).astype(np.float32)
        path = root / f"vb{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utt - 2 else "train"
        entries[split][f"vb{i}"] = {
            "wav": str(path),
            "words": " ".join(LETTERS[c] for c in letters),
            "length": len(sig),
        }
    for split, items in entries.items():
        with open(root / f"{split}.json", "w") as f:
            json.dump(items, f, indent=2)
    return str(root / "train.json"), str(root / "valid.json")


def prepare_common_voice(data_folder, language="en"):
    """Real-dataset preparation from the CommonVoice tsv layout."""
    root = Path(data_folder)
    for split_in, split_out in (("train", "train"), ("dev", "valid"),
                                ("test", "test")):
        tsv = root / f"{split_in}.tsv"
        if not tsv.exists():
            continue
        items = {}
        with open(tsv, encoding="utf-8") as f:
            for row in csv.DictReader(f, delimiter="\t"):
                clip = root / "clips" / row["path"]
                items[row["path"]] = {
                    "wav": str(clip),
                    "words": row["sentence"].lower(),
                    "length": 0,
                }
        with open(root / f"{split_out}.json", "w") as f:
            json.dump(items, f, ensure_ascii=False, indent=2)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_common_voice(folder)
