#!/usr/bin/env python
"""VoiceBank SGMSE+ score-based diffusion enhancement (the reference's
recipes/Voicebank/enhance/SGMSE/train.py re-expressed for
speechbrain_tpu): compressed complex STFT spectrograms; OUVE SDE
denoising score matching (integrations/models/sgmse_plus.py); valid
enhances with predictor-corrector reverse sampling."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class SGMSEBrain(sb.Brain):
    def spec(self, wavs):
        """Magnitude-compressed complex STFT -> (B, F, T, 2)."""
        X = self.hparams.compute_stft(wavs)  # (B, T, F) complex
        X = jnp.moveaxis(X, 1, 2)  # (B, F, T)
        mag = jnp.abs(X)
        comp = mag ** self.hparams.spec_exponent * jnp.exp(
            1j * jnp.angle(X)
        ) * self.hparams.spec_scale
        return jnp.stack([comp.real, comp.imag], axis=-1)

    def compute_forward(self, params, state, batch, stage, rng):
        noisy, _ = batch["noisy_sig"]
        clean, _ = batch["clean_sig"]
        x0 = self.spec(clean)
        y = self.spec(noisy)
        model = self.modules.score_model
        t, z = model.apply(
            {"params": params["score_model"]}, rng, x0,
            method="train_step_inputs",
        )
        loss = model.apply(
            {"params": params["score_model"]}, x0, y, t, z,
            train=stage == sb.Stage.TRAIN, method="loss",
            rngs={"dropout": rng},
        )
        return loss, state

    def compute_objectives(self, loss, batch, stage):
        return loss

    def init_forward(self, rng, eb):
        noisy, _ = eb["noisy_sig"]
        clean, _ = eb["clean_sig"]
        x0 = self.spec(clean)
        y = self.spec(noisy)
        model = self.modules.score_model
        t = jnp.full((x0.shape[0],), 0.5)
        v = dict(model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            x0, y, t, jnp.zeros_like(x0), method="loss",
        ))
        return {"params": {"score_model": v.pop("params")}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def prepare_synthetic(data_folder, n_utts=8, sample_rate=16000, seed=0):
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    T = sample_rate // 2
    t = np.arange(T) / sample_rate
    for i in range(n_utts):
        clean = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                 ).astype(np.float32)
        noisy = clean + 0.2 * rng.standard_normal(T).astype(np.float32)
        cp, npth = root / f"clean_{i}.wav", root / f"noisy_{i}.wav"
        write_audio(str(cp), clean, sample_rate)
        write_audio(str(npth), noisy, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"u{i}"] = {
            "clean_wav": str(cp), "noisy_wav": str(npth),
            "length": T / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


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
        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = SGMSEBrain(
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
        train_loader_kwargs={
            "batch_size": hparams["batch_size"], "shuffle": True,
            "pad_to_multiple": {"noisy_sig": 2048, "clean_sig": 2048},
        },
        valid_loader_kwargs={
            "batch_size": hparams["batch_size"],
            "pad_to_multiple": {"noisy_sig": 2048, "clean_sig": 2048},
        },
    )
