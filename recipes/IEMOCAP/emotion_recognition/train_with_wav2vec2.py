#!/usr/bin/env python
"""IEMOCAP speech emotion recognition over a wav2vec2-style SSL encoder
(the reference's recipes/IEMOCAP/emotion_recognition/
train_with_wav2vec2.py re-expressed for speechbrain_tpu): the native
W2VLatentExtractor front end -> temporal mean pooling -> linear
classifier, NLL over 4 emotions."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

EMOS = ["neu", "hap", "sad", "ang"]


class EmoW2VBrain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        feats, _ = self.module_apply(
            "ssl", params, state, wavs, mutable_state=[],
        )
        pooled = jnp.mean(feats, axis=1)
        logits, _ = self.module_apply(
            "classifier", params, state, pooled, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, predictions, batch, stage):
        labels, _ = batch["emo_id"]
        return nll_loss(predictions, labels)

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        p_s, s_s = self.init_module(rng, "ssl", wavs)
        feats, _ = self.module_apply("ssl", {"ssl": p_s}, {}, wavs)
        p_c, _ = self.init_module(
            rng, "classifier", jnp.mean(feats, axis=1)
        )
        out = {"params": {"ssl": p_s, "classifier": p_c}}
        for coll, tree in s_s.items():
            out[coll] = {"ssl": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"loss": self.train_loss},
            valid_stats={"loss": stage_loss},
        )
        self.save_checkpoint(meta={"loss": stage_loss}, min_keys=["loss"])


def dataio_prepare(hparams):
    import numpy as np

    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda emo: np.int32(EMOS.index(emo) if emo in EMOS else 0),
            takes="emo", provides="emo_id",
        )
        ds.set_output_keys(["id", "sig", "emo_id"])
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
    brain = EmoW2VBrain(
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
                             "shuffle": True,
                             "pad_to_multiple": {"sig": 8000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 8000}},
    )
