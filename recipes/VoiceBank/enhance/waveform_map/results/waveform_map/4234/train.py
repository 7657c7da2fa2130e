#!/usr/bin/env python
"""VoiceBank waveform-mapping enhancement (the reference's
recipes/Voicebank/enhance/waveform_map/train.py re-expressed for
speechbrain_tpu): a time-domain encoder-decoder (the SEGAN generator
topology without the adversary) maps noisy to clean waveforms under an
L1 objective.

Expects JSON manifests {utt: {"noisy_wav": p, "clean_wav": p,
"length": s}}.
"""

import sys
from pathlib import Path

import jax
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import l1_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class WaveMapBrain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        noisy, lens = batch["noisy_sig"]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        est, _ = self.module_apply(
            "model", params, state, noisy, mutable_state=[],
            rngs={"noise": rng},
        )
        return (est, lens), state

    def compute_objectives(self, predictions, batch, stage):
        est, lens = predictions
        clean, _ = batch["clean_sig"]
        return l1_loss(est, clean, length=lens)

    def init_forward(self, rng, eb):
        noisy, _ = eb["noisy_sig"]
        p, s = self.init_module(
            {"params": rng, "noise": rng}, "model", noisy
        )
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"loss": self.train_loss},
            valid_stats={"loss": stage_loss},
        )
        self.save_checkpoint(meta={"loss": stage_loss}, min_keys=["loss"])


def dataio_prepare(hparams):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="noisy_wav",
                            provides="noisy_sig")
        ds.add_dynamic_item(read_audio, takes="clean_wav",
                            provides="clean_sig")
        ds.set_output_keys(["id", "noisy_sig", "clean_sig"])
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
        sys.path.insert(0, str(Path(__file__).parents[1] / "MetricGAN-U"))
        from train import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = WaveMapBrain(
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
                             "shuffle": True,
                             "pad_to_multiple": {"noisy_sig": 16384,
                                                 "clean_sig": 16384}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"noisy_sig": 16384,
                                                 "clean_sig": 16384}},
    )
