#!/usr/bin/env python
"""Switchboard language-model training (the reference's
recipes/Switchboard/LM/train.py re-expressed for speechbrain_tpu)."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class LM(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        tok_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        out, _ = self.module_apply(
            "lm", params, state, tok_bos, mutable_state=[],
            rngs={"dropout": rng} if train else None,
            **({"train": True} if train else {}),
        )
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, predictions, batch, stage):
        tok_eos, lens = batch["tokens_eos"]
        return nll_loss(predictions, tok_eos, length=lens)

    def init_forward(self, rng, eb):
        tok_bos, _ = eb["tokens_bos"]
        p, _ = self.init_module(rng, "lm", tok_bos)
        return {"params": {"lm": p}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr,
                            "valid_ppl": float(np.exp(stage_loss))},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def load_sentences(hparams):
    """Corpus text: lm_corpus.txt if present, else manifest `words`."""
    corpus = Path(hparams["data_folder"]) / "lm_corpus.txt"
    if corpus.exists():
        lines = [
            ln.strip() for ln in corpus.read_text().splitlines()
            if ln.strip()
        ]
    else:
        lines = []
        for key in ("train_annotation", "valid_annotation"):
            path = Path(hparams[key])
            if path.exists():
                with open(path, encoding="utf-8") as f:
                    lines += [e["words"] for e in json.load(f).values()]
    if not lines:
        raise FileNotFoundError(
            "no lm_corpus.txt and no manifests under data_folder"
        )
    n_valid = max(1, len(lines) // 10)
    return lines[n_valid:], lines[:n_valid]


def dataio_prepare(hparams, tokenizer, train_lines, valid_lines):
    datasets = {}
    for split, lines in (("train", train_lines), ("valid", valid_lines)):
        data = {f"{split}_{i}": {"words": ln} for i, ln in enumerate(lines)}
        ds = DynamicItemDataset(data)

        def tokens_pipeline(words):
            ids = tokenizer.sp.encode_as_ids(words)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(tokens_pipeline, takes="words",
                            provides=["tokens_bos", "tokens_eos"])
        ds.set_output_keys(["id", "tokens_bos", "tokens_eos"])
        datasets[split] = ds
    return datasets


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
        sys.path.insert(0, str(Path(__file__).parents[1] / "ASR" / "CTC"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    train_lines, valid_lines = load_sentences(hparams)
    # train the tokenizer from the corpus text directly
    corpus_json = Path(hparams["save_folder"]) / "lm_text.json"
    corpus_json.parent.mkdir(parents=True, exist_ok=True)
    with open(corpus_json, "w", encoding="utf-8") as f:
        json.dump(
            {f"u{i}": {"words": ln} for i, ln in enumerate(train_lines)}, f
        )
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["output_neurons"],
        annotation_train=str(corpus_json),
        annotation_read="words",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer, train_lines, valid_lines)
    brain = LM(
        modules={"lm": hparams["model"]},
        opt_class=lambda: optax.inject_hyperparams(optax.adamw)(
            learning_rate=hparams["lr"]
        ),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    brain.fit(
        hparams["epoch_counter"],
        datasets["train"],
        datasets["valid"],
        train_loader_kwargs={"batch_size": hparams["batch_size"],
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
