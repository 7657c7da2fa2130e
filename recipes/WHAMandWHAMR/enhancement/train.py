#!/usr/bin/env python
"""WHAM! / WHAMR! speech enhancement (the reference's
recipes/WHAMandWHAMR/enhancement/train.py re-expressed for
speechbrain_tpu): the separation machinery run with ``num_spks: 1`` —
the masking network (SepFormer by default) is trained with SI-SNR to
recover the clean (optionally dereverberated) first source from the
noisy mixture.

Run: python train.py hparams/sepformer-wham.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import cal_si_snr
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class Enhancement(sb.Brain):
    """Mask-based single-source enhancement trained with SI-SNR."""

    def compute_forward(self, params, state, batch, stage, rng):
        mix, lens = batch["mix_sig"]
        est, _ = self.module_apply(
            "model", params, state, mix, train=stage == sb.Stage.TRAIN,
            mutable_state=[],
        )
        return est, state

    def compute_objectives(self, est, batch, stage):
        clean, _ = batch["s1_sig"]
        # est is (B, T, num_spks=1); SI-SNR against the clean source
        return jnp.mean(cal_si_snr(clean[..., None], est))

    def init_forward(self, rng, eb):
        mix, lens = eb["mix_sig"]
        p, s = self.init_module(rng, "model", mix, train=False)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"si-snr": self.train_loss},
            valid_stats={"si-snr": stage_loss},
        )
        self.save_checkpoint(meta={"si-snr": stage_loss},
                             min_keys=["si-snr"])


def dataio_prepare(hparams):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="mix_wav", provides="mix_sig")
        ds.add_dynamic_item(read_audio, takes="s1_wav", provides="s1_sig")
        ds.set_output_keys(["id", "mix_sig", "s1_sig"])
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
        # the separation prepare writes mixtures + clean sources
        sys.path.insert(0, str(Path(__file__).parents[1] / "separation"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          reverb=hparams.get("use_reverb", False))
    datasets = dataio_prepare(hparams)
    brain = Enhancement(
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
