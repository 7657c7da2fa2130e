"""LJSpeech preparation (reference recipes/LJSpeech/ljspeech_prepare.py):
indexes metadata.csv wav/text pairs into JSON manifests, or a synthetic
single-speaker tone corpus for --debug runs / recipe tests."""

import csv
import json
import sys
from pathlib import Path

import numpy as np

WORDS = ["lake", "june", "storm", "page", "bird", "cold"]


def prepare_synthetic(data_folder, n_utts=10, sample_rate=16000, seed=0):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    for i in range(n_utts):
        words = [(i + j) % len(WORDS) for j in range(2)]
        sig = np.concatenate([
            np.sin(2 * np.pi * (220 + 80 * w)
                   * np.arange(int(0.2 * sample_rate)) / sample_rate)
            for w in words
        ]).astype(np.float32) * 0.5
        path = root / f"LJ_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"LJ_{i}"] = {
            "wav": str(path),
            "words": " ".join(WORDS[w] for w in words),
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def prepare_ljspeech(data_folder, save_folder=None, valid_frac=0.02):
    """Index a real LJSpeech release (wavs/ + metadata.csv)."""
    root = Path(data_folder)
    save = Path(save_folder or data_folder)
    save.mkdir(parents=True, exist_ok=True)
    meta = root / "metadata.csv"
    rows = []
    with open(meta, encoding="utf-8") as f:
        for row in csv.reader(f, delimiter="|"):
            wav = root / "wavs" / f"{row[0]}.wav"
            if wav.exists():
                rows.append((row[0], str(wav), row[-1].lower()))
    n_valid = max(1, int(len(rows) * valid_frac))
    manifests = {
        "train": rows[n_valid:],
        "valid": rows[:n_valid],
    }
    for split, items in manifests.items():
        out = {
            utt: {"wav": p, "words": text, "length": 0}
            for utt, p, text in items
        }
        with open(save / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False, indent=1)


if __name__ == "__main__":
    folder = sys.argv[1]
    if "--synthetic" in sys.argv:
        prepare_synthetic(folder)
    else:
        prepare_ljspeech(folder)
