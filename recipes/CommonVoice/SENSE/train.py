#!/usr/bin/env python
"""SENSE: speech-text semantic alignment on CommonVoice (the
reference's recipes/CommonVoice/SENSE/train.py re-expressed for
speechbrain_tpu): an SSL speech encoder with an attention-pooling head
is trained to predict SENTENCE embeddings of the transcript (BGE-M3 in
the reference) under a cosine loss, putting speech and text in one
semantic space.

Text embeddings come from ``integrations.nlp.bgeM3`` when available;
otherwise (and always under --debug) a deterministic bag-of-character
projection stands in, so the pipeline self-provisions offline.

Run: python train.py hparams/train_sense.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import length_to_mask, read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

SSL_MODULES = ("extractor",)


class SenseBrain(sb.Brain):
    """SSL extractor -> encoder -> attention pooling -> unit-norm
    utterance embedding, matched to the text embedding by cosine."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        if self.hparams.freeze_wav2vec:
            params = {
                **params,
                "extractor": jax.lax.stop_gradient(params["extractor"]),
            }
        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        lat, _ = self.module_apply(
            "latent_proj", params, state, lat, mutable_state=[]
        )
        T = lat.shape[1]
        pad_mask = ~length_to_mask(
            jnp.round(wav_lens * T), max_len=T
        ).astype(bool)
        enc, _ = self.module_apply(
            "encoder", params, state, lat, src_key_padding_mask=pad_mask,
            train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        enc = enc[0] if isinstance(enc, tuple) else enc
        pooled, _ = self.module_apply(
            "attn_pooling", params, state, enc, mutable_state=[]
        )
        pooled = pooled.reshape(pooled.shape[0], -1)
        emb, _ = self.module_apply(
            "emb_head", params, state, pooled, mutable_state=[]
        )
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
        )
        return emb, state

    def compute_objectives(self, speech_emb, batch, stage):
        text_emb, _ = batch["text_emb"]
        # cosine alignment loss (reference: 1 - cos(speech, text))
        cos = jnp.sum(speech_emb * text_emb, axis=-1)
        return jnp.mean(1.0 - cos)

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
        p["encoder"], _ = self.init_module(rng, "encoder", lat)
        enc, _ = self.module_apply(
            "encoder", {"encoder": p["encoder"]}, {}, lat
        )
        enc = enc[0] if isinstance(enc, tuple) else enc
        p["attn_pooling"], _ = self.init_module(rng, "attn_pooling", enc)
        pooled, _ = self.module_apply(
            "attn_pooling", {"attn_pooling": p["attn_pooling"]}, {}, enc
        )
        pooled = pooled.reshape(pooled.shape[0], -1)
        p["emb_head"], _ = self.init_module(rng, "emb_head", pooled)
        return {"params": p}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            from speechbrain_tpu.nnet.schedulers import update_learning_rate

            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            update_learning_rate(self.opt_state, new_lr, group="main")
            if not self.hparams.freeze_wav2vec:
                old_s, new_s = self.hparams.lr_annealing_wav2vec(stage_loss)
                update_learning_rate(self.opt_state, new_s, group="wav2vec")
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"cosine_loss": self.train_loss},
                valid_stats={"cosine_loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def make_optimizer(hparams):
    ssl = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr_wav2vec"]
    )
    if hparams["freeze_wav2vec"]:
        ssl = optax.set_to_zero()
    main = optax.inject_hyperparams(optax.adam)(learning_rate=hparams["lr"])
    return optax.multi_transform(
        {"wav2vec": ssl, "main": main},
        lambda params: {
            k: ("wav2vec" if k in SSL_MODULES else "main") for k in params
        },
    )


def _hash_text_embedding(text, dim):
    """Deterministic bag-of-character sentence embedding (offline
    stand-in for BGE-M3): stable across runs, similar texts get
    similar vectors."""
    v = np.zeros(dim, np.float32)
    for i, ch in enumerate(text.lower()):
        rng = np.random.default_rng(ord(ch))
        v += rng.standard_normal(dim).astype(np.float32) / (1 + i * 0.01)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def make_text_embedder(hparams):
    dim = hparams["emb_dim"]
    if not hparams.get("use_bge", False):
        return lambda text: _hash_text_embedding(text, dim)
    from speechbrain_tpu.integrations.nlp.bgeM3 import BGEM3

    model = BGEM3(hparams["bge_source"])
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
            text_embedder, takes="words", provides="text_emb"
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
    if not Path(hparams["train_annotation"]).exists() and run_opts.get(
        "debug"
    ):
        sys.path.insert(0, str(Path(__file__).parents[1]))
        from commonvoice_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    text_embedder = make_text_embedder(hparams)
    datasets = dataio_prepare(hparams, text_embedder)
    brain = SenseBrain(
        modules=hparams["modules"],
        opt_class=lambda: make_optimizer(hparams),
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
