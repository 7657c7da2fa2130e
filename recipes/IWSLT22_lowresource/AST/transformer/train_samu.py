#!/usr/bin/env python
"""SAMU-XLSR semantic pretraining (the reference's
recipes/IWSLT22_lowresource/AST/transformer/train_samu.py re-expressed
for speechbrain_tpu): the SSL speech encoder + attention pooling is
trained to predict LaBSE sentence embeddings of the TRANSLATION under
a cosine loss — utterance-level semantic supervision that transfers to
the downstream mBART AST (see train_with_samu_mbart.py, which recovers
this recipe's encoder).

LaBSE comes from ``integrations.huggingface.textencoder`` when
available; --debug uses a deterministic bag-of-character projection so
the pipeline self-provisions offline.

Run: python train_samu.py hparams/train_samu.yaml --data_folder=...
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
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class SamuBrain(sb.Brain):
    """SSL extractor -> attention pooling -> unit-norm embedding,
    cosine-matched to the translation's sentence embedding."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        lat, _ = self.module_apply(
            "latent_proj", params, state, lat, mutable_state=[]
        )
        pooled, _ = self.module_apply(
            "attn_pooling", params, state, lat, mutable_state=[]
        )
        emb, _ = self.module_apply(
            "emb_head", params, state, pooled, mutable_state=[]
        )
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
        )
        return emb, state

    def compute_objectives(self, speech_emb, batch, stage):
        text_emb, _ = batch["text_emb"]
        return jnp.mean(1.0 - jnp.sum(speech_emb * text_emb, axis=-1))

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        p = {}
        p["extractor"], _ = self.init_module(rng, "extractor", wavs)
        lat, _ = self.module_apply(
            "extractor", {"extractor": p["extractor"]}, {}, wavs
        )
        p["latent_proj"], _ = self.init_module(rng, "latent_proj", lat)
        lat, _ = self.module_apply(
            "latent_proj", {"latent_proj": p["latent_proj"]}, {}, lat
        )
        p["attn_pooling"], _ = self.init_module(rng, "attn_pooling", lat)
        pooled, _ = self.module_apply(
            "attn_pooling", {"attn_pooling": p["attn_pooling"]}, {}, lat
        )
        p["emb_head"], _ = self.init_module(rng, "emb_head", pooled)
        return {"params": p}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"cosine_loss": self.train_loss},
                valid_stats={"cosine_loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def _hash_text_embedding(text, dim):
    v = np.zeros(dim, np.float32)
    for i, ch in enumerate(text.lower()):
        rng = np.random.default_rng(ord(ch))
        v += rng.standard_normal(dim).astype(np.float32) / (1 + i * 0.01)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def make_text_embedder(hparams):
    dim = hparams["emb_dim"]
    if not hparams.get("use_labse", False):
        return lambda text: _hash_text_embedding(text, dim)
    from speechbrain_tpu.integrations.huggingface.textencoder import LaBSE

    model = LaBSE(hparams["labse_source"])
    return lambda text: np.asarray(model.encode([text])[0], np.float32)


def dataio_prepare(hparams, text_embedder):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            text_embedder, takes="translation", provides="text_emb"
        )
        ds.set_output_keys(["id", "sig", "text_emb"])
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
    if run_opts.get("debug") and not Path(
        hparams["train_annotation"]
    ).exists():
        sys.path.insert(
            0, str(Path(__file__).parents[2] / "ST" / "transformer")
        )
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    text_embedder = make_text_embedder(hparams)
    datasets = dataio_prepare(hparams, text_embedder)
    brain = SamuBrain(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adam)(
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
                             "pad_to_multiple": {"sig": 16000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 16000}},
    )
