#!/usr/bin/env python
"""FocalCodec stage 1 — quantizer training on continuous audio
representations (the reference's recipes/LibriTTS/focalcodec/
train_quantizer.py re-expressed for speechbrain_tpu): frozen SSL
encoder features -> FocalEncoder compressor -> binary spherical
quantizer (BSQ, with entropy auxiliary) -> FocalDecoder decompressor
reconstructing the features; reconstruction + quantizer-entropy loss.
The focal-modulation compressor/decompressor come from the native
``lobes.models.focalnet`` (the reference imports them from the
external ``focalcodec`` pip package).

Run: python train_quantizer.py hparams/bsq.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class Quantization(sb.Brain):
    """Frozen SSL features -> compress -> BSQ -> decompress."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        feats, _ = self.module_apply(
            "encoder", params, state, wavs, mutable_state=[]
        )
        feats = jax.lax.stop_gradient(feats)  # the SSL encoder is frozen
        lats, _ = self.module_apply(
            "compressor", params, state, feats, train=train,
            mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        qout, _ = self.module_apply(
            "quantizer", params, state, lats, mutable_state=[]
        )
        hyp_feats, _ = self.module_apply(
            "decompressor", params, state, qout["quantized"], train=train,
            mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        return (hyp_feats, feats, qout["aux_loss"]), state

    def compute_objectives(self, predictions, batch, stage):
        hyp_feats, feats, aux_loss = predictions
        rec = jnp.mean((hyp_feats - feats) ** 2)
        return rec + aux_loss

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        p = {}
        p["encoder"], _ = self.init_module(rng, "encoder", wavs)
        feats, _ = self.module_apply(
            "encoder", {"encoder": p["encoder"]}, {}, wavs
        )
        p["compressor"], _ = self.init_module(rng, "compressor", feats)
        lats, _ = self.module_apply(
            "compressor", {"compressor": p["compressor"]}, {}, feats
        )
        p["quantizer"], _ = self.init_module(rng, "quantizer", lats)
        qout, _ = self.module_apply(
            "quantizer", {"quantizer": p["quantizer"]}, {}, lats
        )
        p["decompressor"], _ = self.init_module(
            rng, "decompressor", qout["quantized"]
        )
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
        sys.path.insert(0, str(Path(__file__).parents[1]))
        from libritts_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = Quantization(
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
