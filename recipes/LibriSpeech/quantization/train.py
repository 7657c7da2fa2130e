#!/usr/bin/env python
"""LibriSpeech k-means quantization of speech features (the reference's
recipes/LibriSpeech/quantization/train.py re-expressed for
speechbrain_tpu): fits a device-side mini-batch k-means on Fbank (or
SSL) frames to produce discrete units for discrete-token pipelines.

Run: python train.py --data_folder=DATA --output_folder=OUT \
         [--n_clusters=128] [--n_mels=80]
"""

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
        from librispeech_prepare import prepare_synthetic

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
    ap.add_argument("hparams", nargs="?",
                    help="optional hparams yaml (defaults for the flags)")
    ap.add_argument("--data_folder")
    ap.add_argument("--output_folder")
    ap.add_argument("--n_clusters", type=int)
    ap.add_argument("--n_mels", type=int)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--debug_utts", type=int, default=6)
    args = ap.parse_known_args()[0]
    if args.hparams and Path(args.hparams).exists():
        from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

        with open(args.hparams, encoding="utf-8") as f:
            hp = load_hyperpyyaml(f, overrides={
                k: v for k, v in (("data_folder", args.data_folder),)
                if v is not None
            })
        args.data_folder = args.data_folder or hp.get("data_folder")
        args.output_folder = args.output_folder or hp.get("output_folder")
        args.n_clusters = args.n_clusters or hp.get("n_clusters", 128)
        args.n_mels = args.n_mels or hp.get("n_mels", 80)
    if not args.data_folder or not args.output_folder:
        ap.error("--data_folder and --output_folder (or an hparams yaml) "
                 "are required")
    args.n_clusters = args.n_clusters or 128
    args.n_mels = args.n_mels or 80
    main(args)
