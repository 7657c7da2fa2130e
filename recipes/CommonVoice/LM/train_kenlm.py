#!/usr/bin/env python
"""CommonVoice n-gram LM training (the reference's
recipes/CommonVoice/LM/train_kenlm.py shells out to kenlm lmplz; this
recipe estimates a Witten-Bell backoff model natively via
speechbrain_tpu.lm.estimate and writes ARPA, loadable by the in-loop
NgramDenseScorer / NgramRescorer).

Run: python train_kenlm.py hparams/train_kenlm.yaml --data_folder=DATA
Text source: <data_folder>/lm_corpus.txt (one sentence per line) or the
`words` fields of train.json.
"""

import argparse
import json
from pathlib import Path

from speechbrain_tpu.lm.counting import pad_ends
from speechbrain_tpu.lm.estimate import train_ngram_arpa
from speechbrain_tpu.lm.ngram import (
    BackoffNgramLM,
    ngram_evaluation_details,
    ngram_perplexity,
)


def load_sentences(data_folder):
    corpus = Path(data_folder) / "lm_corpus.txt"
    if corpus.exists():
        lines = [
            ln.strip() for ln in corpus.read_text().splitlines()
            if ln.strip()
        ]
    else:
        with open(Path(data_folder) / "train.json", encoding="utf-8") as f:
            lines = [e["words"] for e in json.load(f).values()]
    return [ln.split() for ln in lines]


def synth_corpus(data_folder, n=40):
    """Tiny synthetic corpus for --debug harness runs."""
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    words = ["oui", "non", "bonjour", "merci", "parle", "vite"]
    lines = [
        " ".join(words[(i + j) % len(words)] for j in range(3 + i % 4))
        for i in range(n)
    ]
    (root / "lm_corpus.txt").write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("hparams", nargs="?",
                    help="optional hparams yaml (defaults for the flags)")
    ap.add_argument("--data_folder")
    ap.add_argument("--output_folder")
    ap.add_argument("--order", type=int)
    ap.add_argument("--debug", action="store_true")
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
        args.order = args.order or hp.get("order", 3)
    if not args.data_folder or not args.output_folder:
        ap.error("--data_folder and --output_folder (or an hparams yaml) "
                 "are required")
    args.order = args.order or 3

    root = Path(args.data_folder)
    if args.debug and not (root / "train.json").exists() and not (
        root / "lm_corpus.txt"
    ).exists():
        synth_corpus(root)
    sents = load_sentences(args.data_folder)
    n_valid = max(1, len(sents) // 10)
    train, valid = sents[n_valid:], sents[:n_valid]

    out = Path(args.output_folder) / "save"
    out.mkdir(parents=True, exist_ok=True)
    arpa_path = out / f"{args.order}gram.arpa"
    probs, backoffs = train_ngram_arpa(train, arpa_path, order=args.order)
    lm = BackoffNgramLM(probs, backoffs)

    eval_data = [list(pad_ends(s)) for s in valid]
    ppl = ngram_perplexity(ngram_evaluation_details(eval_data, lm))
    print(f"ARPA written to {arpa_path}; valid perplexity {ppl:.2f}")
