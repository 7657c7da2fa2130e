#!/usr/bin/env python
"""Aishell1Mix Mandarin 2-speaker separation with SepFormer (the
reference's recipes/Aishell1Mix/separation/train.py re-expressed for
speechbrain_tpu)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import get_si_snr_with_pitwrapper
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class Separation(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        mix, lens = batch["mix_sig"]
        est, _ = self.module_apply(
            "model", params, state, mix, train=stage == sb.Stage.TRAIN,
            mutable_state=[],
        )
        return est, state

    def compute_objectives(self, est, batch, stage):
        n = getattr(self.hparams, "num_spks", 2)
        sources = jnp.stack(
            [batch[f"s{k + 1}_sig"][0] for k in range(n)], axis=-1
        )
        return jnp.mean(get_si_snr_with_pitwrapper(sources, est))

    def init_forward(self, rng, eb):
        mix, lens = eb["mix_sig"]
        p, s = self.init_module(rng, "model", mix, train=False)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"si-snr": self.train_loss},
            valid_stats={"si-snr": stage_loss},
        )
        self.save_checkpoint(meta={"si-snr": stage_loss},
                             min_keys=["si-snr"])


def dataio_prepare(hparams):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        n = hparams.get("num_spks", 2)
        ds.add_dynamic_item(read_audio, takes="mix_wav", provides="mix_sig")
        for k in range(n):
            ds.add_dynamic_item(read_audio, takes=f"s{k + 1}_wav",
                                provides=f"s{k + 1}_sig")
        ds.set_output_keys(
            ["id", "mix_sig"] + [f"s{k + 1}_sig" for k in range(n)]
        )
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
        sys.path.insert(0, str(Path(__file__).parent))
        from prepare import prepare_synthetic

        prepare_synthetic(
            hparams["data_folder"],
            num_spks=hparams.get("num_spks", 2),
            wham_noise=hparams.get("wham_noise", False),
        )
    datasets = dataio_prepare(hparams)
    brain = Separation(
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
