"""LibriTTS preparation (reference recipes/LibriTTS/libritts_prepare.py):
scan {split}/{speaker}/{chapter}/*.wav with sibling .normalized.txt
transcripts into JSON manifests; or synthesize tiny (text, tone) pairs
for --debug runs / recipe tests."""

import json
import sys
from pathlib import Path

import numpy as np

WORDS = ["light", "sound", "voice", "clear", "tone", "speak"]


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
        path = root / f"utt_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"utt_{i}"] = {
            "wav": str(path),
            "words": " ".join(WORDS[w] for w in words),
            "spk_id": f"spk{i % 2}",
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def prepare_libritts(data_folder, save_folder=None,
                     splits=("train-clean-100", "dev-clean")):
    """Index a real LibriTTS release."""
    root = Path(data_folder)
    save = Path(save_folder or data_folder)
    save.mkdir(parents=True, exist_ok=True)
    out_names = {s: ("valid" if s.startswith("dev") else "train")
                 for s in splits}
    manifests = {"train": {}, "valid": {}}
    for split in splits:
        base = root / split
        if not base.is_dir():
            continue
        for wav in sorted(base.rglob("*.wav")):
            txt = wav.with_suffix(".normalized.txt")
            if not txt.exists():
                continue
            manifests[out_names[split]][wav.stem] = {
                "wav": str(wav),
                "words": txt.read_text(encoding="utf-8").strip(),
                "spk_id": wav.stem.split("_")[0],
                "length": 0.0,
            }
    for split, manifest in manifests.items():
        with open(save / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


if __name__ == "__main__":
    folder = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--synthetic":
        prepare_synthetic(folder)
    else:
        prepare_libritts(folder)
