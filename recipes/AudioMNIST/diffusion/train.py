#!/usr/bin/env python
"""AudioMNIST spoken-digit diffusion (the reference's
recipes/AudioMNIST/diffusion/train.py re-expressed for
speechbrain_tpu): DDPM over log-mel spectrogram patches of spoken
digits — a UNet predicts the noise at a sampled timestep, MSE
objective; ancestral sampling generates new digit spectrograms.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.diffusion import DenoisingDiffusion
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class DiffusionBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.diffuser = DenoisingDiffusion(
            model=None, timesteps=self.hparams.timesteps
        )

    def spec(self, wavs):
        """Fixed-size (T, F) log-mel patch in [-1, 1]-ish range."""
        feats = self.hparams.compute_features(wavs)
        T = self.hparams.patch_frames
        feats = feats[:, :T]
        pad = T - feats.shape[1]
        if pad > 0:
            feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        return feats[..., None] / self.hparams.spec_scale

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        x = self.spec(wavs)
        if hasattr(self.modules, "autoencoder"):
            # latent diffusion (the reference's train_latent.yaml /
            # diffusion_mode: latent): the normalizing autoencoder
            # trains jointly on reconstruction; the UNet denoises in
            # its latent space
            (rec, z), _ = self.module_apply(
                "autoencoder", params, state, x, mutable_state=[]
            )
            noisy, noise, t = self.diffuser.train_sample(
                jax.lax.stop_gradient(z), rng
            )
            eps, _ = self.module_apply(
                "unet", params, state, noisy, t, mutable_state=[]
            )
            return (eps, noise, rec, x), state
        noisy, noise, t = self.diffuser.train_sample(x, rng)
        eps, _ = self.module_apply(
            "unet", params, state, noisy, t, mutable_state=[]
        )
        return (eps, noise), state

    def compute_objectives(self, predictions, batch, stage):
        if len(predictions) == 4:
            eps, noise, rec, x = predictions
            diff = jnp.mean((eps - noise) ** 2)
            T = min(rec.shape[1], x.shape[1])
            F = min(rec.shape[2], x.shape[2])
            rec_l = jnp.mean((rec[:, :T, :F] - x[:, :T, :F]) ** 2)
            w = getattr(self.hparams, "rec_weight", 1.0)
            return diff + w * rec_l, {"diffusion": diff, "rec": rec_l}
        eps, noise = predictions
        return jnp.mean((eps - noise) ** 2)

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        x = self.spec(wavs)
        t = jnp.zeros((x.shape[0],), jnp.int32)
        if hasattr(self.modules, "autoencoder"):
            p_ae, _ = self.init_module(rng, "autoencoder", x)
            (_, z), _ = self.module_apply(
                "autoencoder", {"autoencoder": p_ae}, {}, x
            )
            p, _ = self.init_module(rng, "unet", z, t)
            return {"params": {"unet": p, "autoencoder": p_ae}}
        p, _ = self.init_module(rng, "unet", x, t)
        return {"params": {"unet": p}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])

    def sample_spectrograms(self, n=4):
        """Ancestral sampling with the trained UNet."""
        params = self.params

        def model(x, t):
            eps, _ = self.module_apply("unet", params, {}, x, t)
            return eps

        shape = (n, self.hparams.patch_frames, self.hparams.n_mels, 1)
        return self.diffuser.sample(shape, self.rng, model=model)


def prepare_synthetic(data_folder, n_per_digit=2, sample_rate=16000,
                      seed=0):
    """Tone-coded 'digits' 0..3."""
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    for d in range(4):
        for i in range(n_per_digit):
            t = np.arange(int(0.5 * sample_rate)) / sample_rate
            sig = 0.5 * np.sin(2 * np.pi * (300 + 150 * d) * t)
            sig = sig.astype(np.float32)
            sig += 0.01 * rng.standard_normal(len(sig)).astype(np.float32)
            path = root / f"digit{d}_{i}.wav"
            write_audio(str(path), sig, sample_rate)
            split = "valid" if i == n_per_digit - 1 else "train"
            manifests[split][f"digit{d}_{i}"] = {
                "wav": str(path), "digit": d,
                "length": len(sig) / sample_rate,
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
        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = DiffusionBrain(
        modules={
            "unet": hparams["unet"],
            **(
                {"autoencoder": hparams["autoencoder"]}
                if "autoencoder" in hparams else {}
            ),
        },
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
                             "pad_to_multiple": {"sig": 8192}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 8192}},
    )
