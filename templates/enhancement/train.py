#!/usr/bin/env python
"""Speech-enhancement training template (the reference's
templates/enhancement, re-expressed for speechbrain_tpu): spectral
masking trained with magnitude-domain MSE.

Expects JSON manifests {utt: {"noisy_wav": path, "clean_wav": path,
"length": s}}. Run: ``python train.py train.yaml --data_folder=...``.
"""

import sys

import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import mse_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


def _mag(stft, wavs):
    """Magnitude spectrogram via the STFT power fast path."""
    return jnp.sqrt(stft.power(wavs) + 1e-8)


class EnhanceBrain(sb.Brain):
    """Noisy magnitude -> mask -> masked magnitude vs clean magnitude."""

    def compute_forward(self, params, state, batch, stage, rng):
        noisy, lens = batch["noisy_sig"]
        noisy_mag = _mag(self.hparams.compute_stft, noisy)
        mask, _ = self.module_apply(
            "model", params, state, noisy_mag,
            train=stage == sb.Stage.TRAIN, mutable_state=[],
        )
        return noisy_mag * mask, state

    def compute_objectives(self, predictions, batch, stage):
        clean, lens = batch["clean_sig"]
        clean_mag = _mag(self.hparams.compute_stft, clean)
        return mse_loss(predictions, clean_mag, length=lens)

    def init_forward(self, rng, eb):
        noisy, _ = eb["noisy_sig"]
        noisy_mag = _mag(self.hparams.compute_stft, noisy)
        p, _ = self.init_module(rng, "model", noisy_mag, train=False)
        return {"params": {"model": p}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prep(hparams):
    """Manifests -> datasets with noisy/clean signal pipelines."""
    datasets = {}
    for split, ann in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[ann],
            replacements={"data_root": hparams["data_folder"]},
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
    datasets = dataio_prep(hparams)
    brain = EnhanceBrain(
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
                             "shuffle": True, "pad_to_multiple": 2048},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": 2048},
    )
