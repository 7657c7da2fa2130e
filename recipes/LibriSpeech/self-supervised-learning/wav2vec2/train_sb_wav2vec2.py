#!/usr/bin/env python
"""LibriSpeech wav2vec 2.0 pretraining with the framework's native
implementation (the reference's recipes/LibriSpeech/
self-supervised-learning/wav2vec2/train_sb_wav2vec2.py re-expressed
for speechbrain_tpu): InfoNCE over span-masked latents against
Gumbel-quantized targets, PLUS the codebook diversity penalty
``alpha * (GV - perplexity) / GV`` that keeps the quantizer from
collapsing — the term that distinguishes the from-scratch recipe from
the fine-tuning ones.

Run: python train_sb_wav2vec2.py hparams/train_sb_wav2vec2.yaml \
    --data_folder=...
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


class SBW2V2Pretrain(sb.Brain):
    """Native wav2vec2: extractor -> mask -> context net vs quantized
    targets, with the diversity auxiliary loss."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        train = stage == sb.Stage.TRAIN
        k_mask, k_noise, k_neg, k_q, k_drop = jax.random.split(rng, 5)

        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        out, _ = self.module_apply(
            "quantizer", params, state, lat, train=train, mutable_state=[],
            rngs={"gumbel": k_q} if train else None,
        )
        targets, qinfo = out
        mask = w2v_mask(
            lat.shape[:2], self.hparams.mask_prob,
            self.hparams.mask_length, k_mask,
        )
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
        return (preds, targets, negs, mask,
                qinfo["prob_perplexity"]), state

    def compute_objectives(self, predictions, batch, stage):
        preds, targets, negs, mask, perplexity = predictions
        contrastive = w2v_contrastive_loss(
            preds, jax.lax.stop_gradient(targets),
            jax.lax.stop_gradient(negs), mask,
            temperature=self.hparams.temperature,
        )
        # diversity: drive the codebook toward full perplexity GV;
        # gradients flow through the soft Gumbel probabilities
        gv = float(self.hparams.quantiser_vars
                   * self.hparams.quantiser_groups)
        diversity = (gv - perplexity) / gv
        return contrastive + self.hparams.diversity_weight * diversity

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
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = SBW2V2Pretrain(
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
