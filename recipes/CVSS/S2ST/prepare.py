"""CVSS preparation (reference recipes/CVSS/cvss_prepare.py): pairs
CommonVoice source clips with CVSS target speech; target discrete
units are extracted with a k-means/codec tokenizer
(integrations.audio_tokenizers). This indexer expects per-split CSVs
(wav, units space-separated); synthetic mode emits tone utterances
with tone-coded unit sequences."""

import csv
import json
import sys
from pathlib import Path

import numpy as np


def prepare_synthetic(data_folder, n_utts=12, sample_rate=16000, seed=0):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}, "test": {}}
    for i in range(n_utts):
        k = int(rng.integers(0, 4))
        t = np.arange(int(0.25 * sample_rate)) / sample_rate
        sig = 0.5 * np.sin(2 * np.pi * (250 + 120 * k) * t)
        sig = sig.astype(np.float32)
        sig += 0.01 * rng.standard_normal(len(sig)).astype(np.float32)
        path = root / f"cvss_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        units = [1 + k, 5 + k, 9 + k]  # deterministic per class
        split = ("valid" if i % 6 == 4 else "test" if i % 6 == 5
                 else "train")
        manifests[split][f"cvss_{i}"] = {
            "wav": str(path),
            "units": units,
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def prepare_cvss(data_folder, save_folder=None):
    """Index per-split CSVs (wav, units space-separated ids)."""
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
                    "units": [int(u) for u in row["units"].split()],
                    "length": 0.0,
                }
        with open(save / f"{split}.json", "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_cvss(folder)
