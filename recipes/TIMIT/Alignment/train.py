#!/usr/bin/env python
"""TIMIT HMM alignment training (the reference's
recipes/TIMIT/Alignment recipe re-expressed for speechbrain_tpu):
Fbank -> CRDNN emission network; the HMM aligner's forward (or
Viterbi) objective maximizes the likelihood of each utterance's phone
sequence, learning frame-level alignments without frame labels.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.alignment.aligner import HMMAligner
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CategoricalEncoder
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class AlignBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.aligner = HMMAligner()

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        feats = self.hparams.compute_features(wavs)
        out, u1 = self.module_apply(
            "model", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        logits, _ = self.module_apply(
            "out_lin", params, state, out, mutable_state=[]
        )
        ns = self.merge_state(state, "model", u1)
        return jax.nn.log_softmax(logits, -1), ns

    def compute_objectives(self, logp, batch, stage):
        phn, _ = batch["phn_encoded"]
        scores = self.aligner(
            logp, phn, dp_algorithm=self.hparams.dp_algorithm
        )
        return -jnp.mean(scores) / logp.shape[1]

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p1, s1 = self.init_module(rng, "model", feats, train=False)
        out, _ = self.module_apply(
            "model", {"model": p1},
            {k: {"model": v} for k, v in s1.items()}, feats, train=False,
        )
        p2, _ = self.init_module(rng, "out_lin", out)
        ret = {"params": {"model": p1, "out_lin": p2}}
        for coll, tree in s1.items():
            ret[coll] = {"model": tree}
        return ret

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prepare(hparams):
    datasets = {}
    encoder = CategoricalEncoder()
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda phn: phn.split(), takes="phn", provides="phn_list"
        )
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/phn_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list", sequence_input=True,
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda pl: np.asarray(
                encoder.encode_sequence(pl), np.int32
            ),
            takes="phn_list", provides="phn_encoded",
        )
        ds.set_output_keys(["id", "sig", "phn_encoded"])
    return datasets, encoder


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
        sys.path.insert(0, str(Path(__file__).parents[1]))
        from timit_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets, encoder = dataio_prepare(hparams)
    brain = AlignBrain(
        modules=hparams["modules"],
        opt_class=lambda: optax.adam(hparams["lr"]),
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
