#!/usr/bin/env python
"""VoiceBank spectral-mask DEREVERBERATION (the reference's
recipes/Voicebank/dereverb/spectral_mask/train.py re-expressed for
speechbrain_tpu): the same masking model and spectral-MSE objective as
enhance/spectral_mask, but the degraded inputs are reverberant (the
--debug synthetic convolves a decaying random RIR instead of adding
noise).

Expects JSON manifests {utt: {"noisy_wav": p, "clean_wav": p,
"length": s}}.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import mse_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class EnhanceBrain(sb.Brain):
    def spec_mag(self, wavs):
        return jnp.sqrt(self.hparams.compute_stft.power(wavs) + 1e-8)

    def compute_forward(self, params, state, batch, stage, rng):
        noisy, lens = batch["noisy_sig"]
        train = stage == sb.Stage.TRAIN
        noisy_mag = self.spec_mag(noisy)
        mask, u = self.module_apply(
            "model", params, state, noisy_mag, train=train,
            rngs={"dropout": rng} if train else None,
            mutable_state=["batch_stats"] if train else [],
        )
        return (noisy_mag * mask, lens), self.merge_state(state, "model", u)

    def compute_objectives(self, predictions, batch, stage):
        est_mag, lens = predictions
        clean, _ = batch["clean_sig"]
        clean_mag = self.spec_mag(clean)
        return mse_loss(est_mag, clean_mag, length=lens)

    def init_forward(self, rng, eb):
        noisy, _ = eb["noisy_sig"]
        p, s = self.init_module(
            rng, "model", self.spec_mag(noisy), train=False
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
        sys.path.insert(0, str(Path(__file__).parent))
        from prepare import prepare_synthetic_reverb

        prepare_synthetic_reverb(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
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
                             "shuffle": True,
                             "pad_to_multiple": {"noisy_sig": 2048,
                                                 "clean_sig": 2048}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"noisy_sig": 2048,
                                                 "clean_sig": 2048}},
    )
