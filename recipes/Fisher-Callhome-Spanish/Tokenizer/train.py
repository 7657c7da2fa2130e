#!/usr/bin/env python
"""Fisher-Callhome-Spanish tokenizer training (the reference's
recipes/Fisher-Callhome-Spanish/Tokenizer/train.py re-expressed for
speechbrain_tpu): trains the from-scratch SentencePiece-compatible
tokenizer on the Spanish transcripts (or the English translations via
``annotation_read``) used by the ST recipes.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import json
import sys
from pathlib import Path

import speechbrain_tpu as sb
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file, encoding="utf-8") as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
    )
    if not Path(hparams["train_annotation"]).exists() and run_opts.get(
        "debug"
    ):
        sys.path.insert(
            0, str(Path(__file__).parents[1] / "ST" / "transformer")
        )
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["token_output"],
        annotation_train=hparams["train_annotation"],
        annotation_read=hparams.get("annotation_read", "transcript"),
        model_type=hparams["token_type"],
        annotation_format="json",
        character_coverage=hparams.get("character_coverage", 1.0),
    )
    with open(hparams["train_annotation"], encoding="utf-8") as f:
        read = hparams.get("annotation_read", "transcript")
        texts = [e[read] for e in json.load(f).values()]
    n_tokens, n_chars = 0, 0
    for text in texts[:1000]:
        ids = tokenizer.sp.encode_as_ids(text)
        decoded = tokenizer.sp.decode_ids(ids)
        assert isinstance(decoded, str) and decoded
        n_tokens += len(ids)
        n_chars += len(text)
    print(
        f"tokenizer: {hparams['token_type']}-{hparams['token_output']} "
        f"round-trip OK; compression {n_chars / max(n_tokens, 1):.2f} "
        f"chars/token -> {hparams['save_folder']}"
    )
