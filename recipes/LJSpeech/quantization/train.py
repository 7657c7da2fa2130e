#!/usr/bin/env python
"""LJSpeech k-means quantization of SSL features (the reference's
recipes/LJSpeech/quantization/train.py re-expressed for
speechbrain_tpu)."""

import argparse
import json
from pathlib import Path

import numpy as np

from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.integrations.audio_tokenizers.kmeans import (
    MiniBatchKMeans,
)
from speechbrain_tpu.lobes.features import Fbank


def main(args):
    out = Path(args.output_folder)
    (out / "save").mkdir(parents=True, exist_ok=True)
    manifest = Path(args.data_folder) / "train.json"
    if not manifest.exists() and args.debug:
        import sys

        sys.path.insert(0, str(Path(__file__).parents[1]))
        from ljspeech_prepare import prepare_synthetic

        prepare_synthetic(args.data_folder)
    with open(manifest, encoding="utf-8") as f:
        entries = list(json.load(f).values())
    if args.debug:
        entries = entries[: args.debug_utts]

    fbank = Fbank(n_mels=args.n_mels)
    km = MiniBatchKMeans(n_clusters=args.n_clusters, seed=0)
    n_frames = 0
    for e in entries:
        sig = np.asarray(read_audio(e["wav"]))[None]
        feats = np.asarray(fbank(sig))[0]
        km.partial_fit(feats)
        n_frames += feats.shape[0]
    ckpt = out / "save" / "kmeans.ckpt"
    km.save(str(ckpt))
    # report codebook usage + inertia on the last batch
    units = np.asarray(km.predict(feats))
    usage = len(np.unique(units)) / args.n_clusters
    print(
        f"kmeans: {args.n_clusters} clusters over {n_frames} frames; "
        f"codebook usage {usage:.1%}; saved -> {ckpt}"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("hparams", nargs="?", help="unused; harness compat")
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--n_clusters", type=int, default=128)
    ap.add_argument("--n_mels", type=int, default=80)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--debug_utts", type=int, default=6)
    main(ap.parse_known_args()[0])
