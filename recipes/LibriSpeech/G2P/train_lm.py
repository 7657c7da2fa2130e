#!/usr/bin/env python
"""Phoneme-level language model for G2P beam decoding (the reference's
recipes/LibriSpeech/G2P/train_lm.py re-expressed for speechbrain_tpu):
an RNNLM over the lexicon's phoneme sequences, NLL objective; the
trained LM fuses into the G2P searcher via RNNLMScorer.

Run: python train_lm.py hparams/train_lm.yaml --data_folder=...
"""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import TextEncoder
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class PhnLM(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        tok_bos, _ = batch["phn_bos"]
        train = stage == sb.Stage.TRAIN
        out, _ = self.module_apply(
            "lm", params, state, tok_bos, mutable_state=[],
            rngs={"dropout": rng} if train else None,
            **({"train": True} if train else {}),
        )
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, predictions, batch, stage):
        tok_eos, lens = batch["phn_eos"]
        return nll_loss(predictions, tok_eos, length=lens)

    def init_forward(self, rng, eb):
        tok_bos, _ = eb["phn_bos"]
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


def dataio_prepare(hparams):
    """Lexicon -> datasets of bos/eos phoneme id sequences. The phoneme
    inventory file and its ``<eos-bos>`` convention are SHARED with
    ./train.py so the LM's ids line up with the G2P model's outputs."""
    lexicon_path = Path(hparams["data_folder"]) / "lexicon.txt"
    entries = {}
    for i, line in enumerate(lexicon_path.read_text().splitlines()):
        parts = line.strip().split()
        if len(parts) < 2:
            continue
        entries[f"w{i}"] = {"phn_list": parts[1:]}
    items = list(entries.items())
    n_valid = max(1, len(items) // 10)
    splits = {"valid": dict(items[:n_valid]), "train": dict(items[n_valid:])}

    encoder = TextEncoder()
    datasets = {s: DynamicItemDataset(d) for s, d in splits.items()}
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/phoneme_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list", sequence_input=True,
        special_labels={"bos_label": "<eos-bos>",
                        "eos_label": "<eos-bos>"},
    )
    bos = encoder.lab2ind["<eos-bos>"]
    for ds in datasets.values():
        def phn_pipeline(phn_list):
            ids = [int(i) for i in encoder.encode_sequence(phn_list)]
            yield np.asarray([bos] + ids, np.int32)
            yield np.asarray(ids + [bos], np.int32)

        ds.add_dynamic_item(
            phn_pipeline, takes="phn_list", provides=["phn_bos", "phn_eos"]
        )
        ds.set_output_keys(["id", "phn_bos", "phn_eos"])
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
    if not (Path(hparams["data_folder"]) / "lexicon.txt").exists() and (
        run_opts.get("debug")
    ):
        sys.path.insert(0, str(Path(__file__).parent))
        from train import prepare_synthetic_lexicon

        prepare_synthetic_lexicon(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = PhnLM(
        modules={"lm": hparams["model"]},
        opt_class=lambda: optax.inject_hyperparams(optax.adam)(
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
