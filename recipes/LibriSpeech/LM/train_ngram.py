#!/usr/bin/env python
"""LibriSpeech n-gram LM training (the reference's
recipes/LibriSpeech/LM/train_ngram.py shells out to kenlm lmplz; this
recipe estimates a Witten-Bell backoff model natively via
speechbrain_tpu.lm.estimate and writes ARPA).

Run: python train_ngram.py --data_folder=DATA --output_folder=OUT \
         [--order=3]
Text source: <data_folder>/lm_corpus.txt (one sentence per line) or the
`words` fields of train.json.
"""

import argparse
import json
from pathlib import Path

from speechbrain_tpu.lm.estimate import train_ngram_arpa
from speechbrain_tpu.lm.ngram import (
    BackoffNgramLM,
    ngram_evaluation_details,
    ngram_perplexity,
)
from speechbrain_tpu.lm.counting import pad_ends


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


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("hparams", nargs="?", help="unused; harness compat")
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_known_args()[0]

    if not (Path(args.data_folder) / "train.json").exists() and (
        not (Path(args.data_folder) / "lm_corpus.txt").exists()
    ) and args.debug:
        import sys

        sys.path.insert(0, str(Path(__file__).parents[1]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(args.data_folder)
    sents = load_sentences(args.data_folder)
    n_valid = max(1, len(sents) // 10)
    train, valid = sents[n_valid:], sents[:n_valid]

    out = Path(args.output_folder) / "save"
    out.mkdir(parents=True, exist_ok=True)
    arpa_path = out / f"{args.order}gram.arpa"
    probs, backoffs = train_ngram_arpa(train, arpa_path, order=args.order)
    lm = BackoffNgramLM(probs, backoffs)

    eval_data = [list(pad_ends(s)) for s in valid]
    details = ngram_evaluation_details(eval_data, lm)
    ppl = ngram_perplexity(details)
    print(f"ARPA written to {arpa_path}; valid perplexity {ppl:.2f}")
