#!/usr/bin/env python
"""NMF dictionary pretraining on ESC-50 spectrograms (the reference's
recipes/ESC50/interpret/train_nmf.py re-expressed for speechbrain_tpu):
log1p power spectrogram -> convolutional NMFEncoder activations ->
NMFDecoderAudio reconstruction, MSE + L1 sparsity on the activations.
The learned nonnegative dictionary W seeds the L2I interpreter."""

import sys
from pathlib import Path

import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class NMFBrain(sb.Brain):
    def _spectrogram(self, wavs):
        X = self.hparams.compute_stft(wavs)
        Xp = spectral_magnitude(X, power=self.hparams.spec_mag_power)
        return jnp.log1p(jnp.moveaxis(Xp, 1, 2))  # (B, F, T)

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        X = self._spectrogram(wavs)
        H, _ = self.module_apply("nmf_encoder", params, state, X)
        Xhat, _ = self.module_apply("nmf_decoder", params, state, H)
        return (X, Xhat, H), state

    def compute_objectives(self, pred, batch, stage):
        X, Xhat, H = pred
        rec = jnp.mean((Xhat - X) ** 2)
        sparsity = jnp.mean(jnp.abs(H))
        return rec + self.hparams.sparsity_weight * sparsity, {
            "rec": rec, "sparsity": sparsity,
        }

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        X = self._spectrogram(wavs)
        p1, _ = self.init_module(rng, "nmf_encoder", X)
        H, _ = self.module_apply(
            "nmf_encoder", {"nmf_encoder": p1}, {}, X
        )
        p2, _ = self.init_module(rng, "nmf_decoder", H)
        return {"params": {"nmf_encoder": p1, "nmf_decoder": p2}}

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
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.set_output_keys(["id", "sig"])
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

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = NMFBrain(
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
