#!/usr/bin/env python
"""Google Speech Commands keyword spotting with x-vectors (the
reference's recipes/Google-speech-commands/train.py re-expressed for
speechbrain_tpu): Fbank -> Xvector -> Classifier, NLL over commands.
Published reference accuracy: 97.43% (PERFORMANCE.md:148)."""

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


class CommandBrain(sb.Brain):
    def _features(self, params, state, wavs, train):
        """Fixed Fbank from hparams, or a LEARNABLE frontend module
        (the reference's xvect_leaf.yaml: LEAF trains with the model)."""
        if hasattr(self.modules, "compute_features"):
            feats, _ = self.module_apply(
                "compute_features", params, state, wavs, train=train,
                mutable_state=[],
            )
            return feats
        return self.hparams.compute_features(wavs)

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        feats = self._features(params, state, wavs, train)
        mut = ["batch_stats"] if train else []
        emb, u1 = self.module_apply(
            "embedding_model", params, state, feats, train=train,
            mutable_state=mut,
        )
        logp, u2 = self.module_apply(
            "classifier", params, state, emb, train=train, mutable_state=mut
        )
        ns = self.merge_state(
            self.merge_state(state, "embedding_model", u1), "classifier", u2
        )
        return logp[:, 0], ns

    def compute_objectives(self, logp, batch, stage):
        cmd, _ = batch["command_encoded"]
        cmd = jnp.asarray(cmd).reshape(-1)
        return nll_loss(logp, cmd), {
            "error": classification_error(logp, cmd)
        }

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        extra = {}
        if hasattr(self.modules, "compute_features"):
            p0, _ = self.init_module(rng, "compute_features", wavs,
                                     train=False)
            extra["compute_features"] = p0
            feats, _ = self.module_apply(
                "compute_features", {"compute_features": p0}, {}, wavs,
                train=False,
            )
        else:
            feats = self.hparams.compute_features(wavs)
        p1, s1 = self.init_module(rng, "embedding_model", feats, train=False)
        emb, _ = self.module_apply(
            "embedding_model", {"embedding_model": p1},
            {k: {"embedding_model": v} for k, v in s1.items()},
            feats, train=False,
        )
        p2, s2 = self.init_module(rng, "classifier", emb, train=False)
        out = {"params": {"embedding_model": p1, "classifier": p2,
                          **extra}}
        for coll in set(s1) | set(s2):
            out[coll] = {"embedding_model": s1.get(coll, {}),
                         "classifier": s2.get(coll, {})}
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
        output_key="command",
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda c: encoder.encode_label(c), takes="command",
            provides="command_encoded",
        )
        ds.set_output_keys(["id", "sig", "command_encoded"])
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
    brain = CommandBrain(
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
