#!/usr/bin/env python
"""VoxCeleb speaker-embedding training (the reference's
recipes/VoxCeleb/SpeakerRec/train_speaker_embeddings.py, re-expressed
for speechbrain_tpu): random fixed-length chunks -> Fbank -> ECAPA-TDNN
-> AAM-softmax over speakers. Evaluate EER with
speaker_verification_cosine.py.
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
from speechbrain_tpu.nnet.losses import (
    AdditiveAngularMargin,
    LogSoftmaxWrapper,
    classification_error,
)
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class SpeakerBrain(sb.Brain):
    """Fbank -> ECAPA -> AAM-softmax speaker classification."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.loss_fn = LogSoftmaxWrapper(
            AdditiveAngularMargin(margin=0.2, scale=30)
        )

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        feats = self.hparams.compute_features(wavs)
        mut = ["batch_stats"] if train else []
        emb, u1 = self.module_apply(
            "embedding_model", params, state, feats, lengths=lens,
            train=train, mutable_state=mut,
        )
        cos, u2 = self.module_apply(
            "classifier", params, state, emb, train=train, mutable_state=mut
        )
        ns = self.merge_state(
            self.merge_state(state, "embedding_model", u1), "classifier", u2
        )
        return cos, ns

    def compute_objectives(self, cos, batch, stage):
        spk, _ = batch["spk_id_encoded"]
        spk = jnp.asarray(spk).reshape(-1)
        loss = self.loss_fn(cos, spk)
        return loss, {"error": classification_error(cos, spk)}

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p1, s1 = self.init_module(
            rng, "embedding_model", feats, lengths=lens, train=False
        )
        emb, _ = self.module_apply(
            "embedding_model", {"embedding_model": p1},
            {k: {"embedding_model": v} for k, v in s1.items()},
            feats, lengths=lens, train=False,
        )
        p2, s2 = self.init_module(rng, "classifier", emb, train=False)
        out = {"params": {"embedding_model": p1, "classifier": p2}}
        for coll in set(s1) | set(s2):
            out[coll] = {"embedding_model": s1.get(coll, {}),
                         "classifier": s2.get(coll, {})}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            new_lr = self.hparams.lr_scheduler(self.optimizer_step)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": new_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prepare(hparams):
    """Random fixed-length training chunks + speaker labels."""
    datasets = {}
    encoder = hparams["label_encoder"]
    chunk = int(hparams["sentence_len"] * hparams["sample_rate"])
    rng = np.random.default_rng(hparams["seed"])

    def chunk_pipeline(wav):
        sig = read_audio(wav)
        if len(sig) > chunk:
            start = int(rng.integers(0, len(sig) - chunk))
            sig = sig[start : start + chunk]
        return sig

    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(chunk_pipeline, takes="wav", provides="sig")
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="spk_id",
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda spk: encoder.encode_label(spk), takes="spk_id",
            provides="spk_id_encoded",
        )
        ds.set_output_keys(["id", "sig", "spk_id_encoded"])
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

        prepare_synthetic(
            hparams["data_folder"],
            save_folder=Path(hparams["train_annotation"]).parent,
        )
    datasets = dataio_prepare(hparams)
    brain = SpeakerBrain(
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
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
