#!/usr/bin/env python
"""ZaionEmotionDataset speech emotion diarization (the reference's
recipes/ZaionEmotionDataset/emotion_diarization/train.py re-expressed
for speechbrain_tpu): Fbank -> CRDNN -> per-frame emotion logits,
cross-entropy against interval-derived frame labels (EDER metric
convention: neutral vs emotion intervals per utterance).

Run: python train.py hparams/train.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
import jax
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class EmoDiarBrain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        feats = self.hparams.compute_features(wavs)
        out, u1 = self.module_apply(
            "model", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        logits, _ = self.module_apply(
            "out_lin", params, state, out, mutable_state=[]
        )
        ns = self.merge_state(state, "model", u1)
        return logits, ns

    def compute_objectives(self, logits, batch, stage):
        wavs, _ = batch["sig"]
        intervals, _ = batch["emotion_intervals"]
        # frame centers in seconds -> emotion labels (0 = neutral)
        n_frames = logits.shape[1]
        dur = wavs.shape[1] / self.hparams.sample_rate
        centers = (jnp.arange(n_frames) + 0.5) * (dur / n_frames)
        starts = intervals[..., 0]
        ends = intervals[..., 1]
        emo_ids = intervals[..., 2].astype(jnp.int32)
        inside = (centers[None, :, None] >= starts[:, None, :]) & (
            centers[None, :, None] < ends[:, None, :]
        )
        labels = jnp.max(
            jnp.where(inside, emo_ids[:, None, :], 0), axis=-1
        )
        logp = jax.nn.log_softmax(logits, -1)
        return nll_loss(logp, labels)

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p1, s1 = self.init_module(rng, "model", feats, train=False)
        out, _ = self.module_apply(
            "model", {"model": p1},
            {k: {"model": v} for k, v in s1.items()}, feats, train=False,
        )
        p2, _ = self.init_module(rng, "out_lin", out)
        ret = {"params": {"model": p1, "out_lin": p2}}
        for coll, tree in s1.items():
            ret[coll] = {"model": tree}
        return ret

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
    max_int = hparams.get("max_intervals", 8)
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def intervals_pipeline(emotion):
            arr = np.zeros((max_int, 3), np.float32)
            for i, (s, e, emo) in enumerate(emotion[:max_int]):
                arr[i] = (s, e, emo)
            return arr

        ds.add_dynamic_item(
            intervals_pipeline, takes="emotion",
            provides="emotion_intervals",
        )
        ds.set_output_keys(["id", "sig", "emotion_intervals"])
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
    brain = EmoDiarBrain(
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
