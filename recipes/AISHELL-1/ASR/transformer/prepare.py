"""AISHELL-1 preparation (reference recipes/AISHELL-1/aishell_prepare.py):
builds JSON manifests with character transcripts, or synthesizes a tiny
tone->character dataset for --debug runs / recipe tests."""

import json
import sys
from pathlib import Path

import numpy as np

CHARS = ["一", "二", "三", "四", "五"]


def prepare_synthetic(data_folder, n_utt=10, sample_rate=16000):
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(0)
    entries = {"train": {}, "valid": {}}
    for i in range(n_utt):
        chars = rng.integers(0, len(CHARS), size=2)
        sig = np.concatenate([
            np.sin(2 * np.pi * (300 + 150 * c) * np.arange(2400) / sample_rate)
            for c in chars
        ]).astype(np.float32)
        path = root / f"utt{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utt - 2 else "train"
        entries[split][f"utt{i}"] = {
            "wav": str(path),
            "transcript": "".join(CHARS[c] for c in chars),
            "length": len(sig),
        }
    for split, items in entries.items():
        with open(root / f"{split}.json", "w") as f:
            json.dump(items, f, ensure_ascii=False, indent=2)
    return str(root / "train.json"), str(root / "valid.json")


def prepare_aishell(data_folder):
    """Real-dataset preparation from the AISHELL-1 layout
    (wav/{train,dev,test}/SXXXX/*.wav + transcript file)."""
    root = Path(data_folder)
    trans = {}
    tfile = root / "transcript" / "aishell_transcript_v0.8.txt"
    if tfile.exists():
        for line in tfile.read_text(encoding="utf-8").splitlines():
            parts = line.split(maxsplit=1)
            if len(parts) == 2:
                trans[parts[0]] = parts[1].replace(" ", "")
    for split_in, split_out in (("train", "train"), ("dev", "valid"),
                                ("test", "test")):
        items = {}
        for wav in sorted((root / "wav" / split_in).rglob("*.wav")):
            utt = wav.stem
            if utt not in trans:
                continue
            items[utt] = {"wav": str(wav), "transcript": trans[utt],
                          "length": 0}
        with open(root / f"{split_out}.json", "w") as f:
            json.dump(items, f, ensure_ascii=False, indent=2)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_aishell(folder)
