#!/usr/bin/env python
"""Libri-Light wav2vec 2.0 pretraining (the reference's
recipes/Libri-Light/self-supervised-learning recipe re-expressed for
speechbrain_tpu): raw waveform -> conv latent extractor; latents are
span-masked and a transformer context network predicts the Gumbel-
quantized targets of the masked frames against within-utterance
negatives (InfoNCE).

Run: python train.py hparams/wav2vec2.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.wav2vec import (
    sample_negatives,
    w2v_contrastive_loss,
    w2v_mask,
)
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class W2V2Pretrain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        train = stage == sb.Stage.TRAIN
        k_mask, k_noise, k_neg, k_q, k_drop = jax.random.split(rng, 5)

        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        # quantized targets from the clean latents
        targets, _ = self.module_apply(
            "quantizer", params, state, lat, train=train, mutable_state=[],
            rngs={"gumbel": k_q} if train else None,
        )
        targets = targets[0] if isinstance(targets, tuple) else targets
        mask = w2v_mask(
            lat.shape[:2], self.hparams.mask_prob,
            self.hparams.mask_length, k_mask,
        )
        # replace masked latents with noise from an INDEPENDENT key —
        # reusing the mask key would make the replacement vectors a
        # deterministic function of the mask pattern
        noise = 0.1 * jax.random.normal(k_noise, lat.shape, lat.dtype)
        masked = jnp.where(mask[..., None], noise, lat)
        proj, _ = self.module_apply(
            "latent_proj", params, state, masked, mutable_state=[]
        )
        ctx, _ = self.module_apply(
            "encoder", params, state, proj, train=train, mutable_state=[],
            rngs={"dropout": k_drop} if train else None,
        )
        ctx = ctx[0] if isinstance(ctx, tuple) else ctx
        preds, _ = self.module_apply(
            "pred_head", params, state, ctx, mutable_state=[]
        )
        negs = sample_negatives(targets, self.hparams.num_negatives, k_neg)
        return (preds, targets, negs, mask), state

    def compute_objectives(self, predictions, batch, stage):
        preds, targets, negs, mask = predictions
        return w2v_contrastive_loss(
            preds, jax.lax.stop_gradient(targets),
            jax.lax.stop_gradient(negs), mask,
            temperature=self.hparams.temperature,
        )

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        p = {}
        p["extractor"], _ = self.init_module(rng, "extractor", wavs)
        lat, _ = self.module_apply(
            "extractor", {"extractor": p["extractor"]}, {}, wavs
        )
        p["quantizer"], _ = self.init_module(
            rng, "quantizer", lat, train=False
        )
        p["latent_proj"], _ = self.init_module(rng, "latent_proj", lat)
        proj, _ = self.module_apply(
            "latent_proj", {"latent_proj": p["latent_proj"]}, {}, lat
        )
        p["encoder"], _ = self.init_module(rng, "encoder", proj)
        ctx, _ = self.module_apply(
            "encoder", {"encoder": p["encoder"]}, {}, proj
        )
        ctx = ctx[0] if isinstance(ctx, tuple) else ctx
        p["pred_head"], _ = self.init_module(rng, "pred_head", ctx)
        return {"params": p}

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


def prepare_synthetic(data_folder, n_utts=10, sample_rate=16000, seed=0):
    """Unlabeled tone utterances (Libri-Light is untranscribed)."""
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    for i in range(n_utts):
        t = np.arange(int(0.5 * sample_rate)) / sample_rate
        sig = 0.5 * np.sin(2 * np.pi * (200 + 60 * (i % 5)) * t)
        sig = sig.astype(np.float32)
        sig += 0.01 * rng.standard_normal(len(sig)).astype(np.float32)
        path = root / f"ll_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"ll_{i}"] = {
            "wav": str(path), "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


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
    brain = W2V2Pretrain(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adamw)(
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
                             "shuffle": True,
                             "pad_to_multiple": {"sig": 8000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 8000}},
    )
