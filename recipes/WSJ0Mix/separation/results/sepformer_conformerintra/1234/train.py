#!/usr/bin/env python
"""WSJ0-2mix SepFormer training (the reference's
recipes/WSJ0Mix/separation/train.py, re-expressed for speechbrain_tpu):
permutation-invariant negative SI-SNR over separated sources.

Expects JSON manifests {utt: {"mix_wav": p, "s1_wav": p, "s2_wav": p,
"length": s}}. Run: ``python train.py hparams/sepformer.yaml
--data_folder=...``.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import get_si_snr_with_pitwrapper
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class Separation(sb.Brain):
    """Mixture -> SepFormer -> per-speaker estimates; PIT SI-SNR loss."""

    def compute_forward(self, params, state, batch, stage, rng):
        mix, lens = batch["mix_sig"]
        train = stage == sb.Stage.TRAIN
        est, _ = self.module_apply(
            "model", params, state, mix, train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        return est, state

    def compute_objectives(self, est_sources, batch, stage):
        s1, lens = batch["s1_sig"]
        s2, _ = batch["s2_sig"]
        targets = jnp.stack([s1, s2], axis=-1)
        loss = get_si_snr_with_pitwrapper(targets, est_sources, lens)
        # clamp pathological utterances like the reference's loss_upper_lim
        loss = jnp.clip(loss, a_max=self.hparams.loss_upper_lim)
        return jnp.mean(loss)

    def init_forward(self, rng, eb):
        mix, _ = eb["mix_sig"]
        p, s = self.init_module(rng, "model", mix, train=False)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            from speechbrain_tpu.nnet.schedulers import _find_injected

            cur_lr = float(
                _find_injected(self.opt_state).hyperparams["learning_rate"]
            )
            old_lr, new_lr = self.hparams.lr_scheduler(
                cur_lr, epoch, stage_loss
            )
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": new_lr,
                            "si-snr": -float(stage_loss)},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prepare(hparams):
    """Random aligned crops of (mix, s1, s2)."""
    datasets = {}
    L = hparams["training_signal_len"]
    rng = np.random.default_rng(hparams["seed"])

    def triple_pipeline(mix_wav, s1_wav, s2_wav):
        mix = read_audio(mix_wav)
        s1 = read_audio(s1_wav)
        s2 = read_audio(s2_wav)
        n = min(len(mix), len(s1), len(s2))
        if n > L:
            start = int(rng.integers(0, n - L))
            sl = slice(start, start + L)
        else:
            sl = slice(0, n)
        yield mix[sl]
        yield s1[sl]
        yield s2[sl]

    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(
            triple_pipeline, takes=["mix_wav", "s1_wav", "s2_wav"],
            provides=["mix_sig", "s1_sig", "s2_sig"],
        )
        ds.set_output_keys(["id", "mix_sig", "s1_sig", "s2_sig"])
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
        sys.path.insert(
            0, str(Path(__file__).parents[2] / "LibriMix" / "separation")
        )
        from prepare import prepare_synthetic

        prepare_synthetic(
            Path(hparams["train_annotation"]).parent,
            sample_rate=hparams["sample_rate"],
        )
    datasets = dataio_prepare(hparams)
    brain = Separation(
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
