#!/usr/bin/env python
"""UrbanSound8k sound classification with Cnn14 (the reference's
recipes/UrbanSound8k/SoundClassification/train.py re-expressed for
speechbrain_tpu; published accuracy ~75%): Fbank -> Cnn14 embeddings
-> mean pool -> linear classifier, NLL over 10 urban sound classes."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import classification_error, nll_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class SoundBrain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        feats = self.hparams.compute_features(wavs)
        mut = ["batch_stats"] if train else []
        emb, u1 = self.module_apply(
            "embedding_model", params, state, feats, train=train,
            mutable_state=mut,
        )
        emb = jnp.mean(emb, axis=1, keepdims=True)
        logits, _ = self.module_apply(
            "classifier", params, state, emb, mutable_state=[]
        )
        ns = self.merge_state(state, "embedding_model", u1)
        # Linear head -> (B, 1, C); ECAPA Classifier -> (B, C)
        if logits.ndim == 3:
            logits = logits[:, 0]
        return jax.nn.log_softmax(logits, axis=-1), ns

    def compute_objectives(self, logp, batch, stage):
        cls, _ = batch["class_encoded"]
        cls = jnp.asarray(cls).reshape(-1)
        return nll_loss(logp, cls), {
            "error": classification_error(logp, cls)
        }

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p1, s1 = self.init_module(rng, "embedding_model", feats, train=False)
        emb, _ = self.module_apply(
            "embedding_model", {"embedding_model": p1},
            {k: {"embedding_model": v} for k, v in s1.items()},
            feats, train=False,
        )
        emb = jnp.mean(emb, axis=1, keepdims=True)
        p2, _ = self.init_module(rng, "classifier", emb)
        out = {"params": {"embedding_model": p1, "classifier": p2}}
        for coll, tree in s1.items():
            out[coll] = {"embedding_model": tree}
        return out

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
    encoder = hparams["label_encoder"]
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="class_name",
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda c: encoder.encode_label(c), takes="class_name",
            provides="class_encoded",
        )
        ds.set_output_keys(["id", "sig", "class_encoded"])
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
    brain = SoundBrain(
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
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
