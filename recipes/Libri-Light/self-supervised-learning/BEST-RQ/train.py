#!/usr/bin/env python
"""Libri-Light BEST-RQ self-supervised pretraining (the reference's
recipes/Libri-Light/self-supervised-learning/BEST-RQ/train.py
re-expressed for speechbrain_tpu): Fbank frames are span-masked, a
frozen random-projection quantizer produces codeword targets from the
clean frames, and a Conformer encoder predicts the codewords at masked
positions (cross-entropy).

Run: python train.py hparams/bestrq.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.BESTRQ import brq_accuracy, compute_brq_loss
from speechbrain_tpu.lobes.models.wav2vec import w2v_mask
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class BestRQ(sb.Brain):
    """Masked fbank -> Conformer -> codeword classification."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []

        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        # frame-level span mask (shared sampler with wav2vec)
        k_mask, k_drop = jax.random.split(rng)
        mask = w2v_mask(
            feats.shape[:2], self.hparams.mask_prob,
            self.hparams.mask_length, k_mask,
        )
        # targets from the *clean* frames via the frozen quantizer
        targets, _ = self.module_apply(
            "quantizer", params, state, feats, mutable_state=[]
        )
        targets = jax.lax.stop_gradient(targets)
        # mask-fill with noise (BEST-RQ uses N(0, 0.1) fill)
        noise = 0.1 * jax.random.normal(k_drop, feats.shape, feats.dtype)
        masked = jnp.where(mask[..., None], noise, feats)

        x, u0 = self.module_apply(
            "frontend", params, state, masked, train=train,
            mutable_state=mut, rngs={"dropout": rng} if train else None,
        )
        # frontend stride-2 conv halves T twice: map frame mask/targets
        # to the encoder rate by strided subsampling
        stride = feats.shape[1] // x.shape[1] if x.shape[1] else 1
        sub_mask = mask[:, ::stride][:, : x.shape[1]]
        sub_targets = targets[:, ::stride][:, : x.shape[1]]
        enc, _ = self.module_apply(
            "encoder", params, state, x, wav_len=wav_lens, train=train,
            mutable_state=[], method="encode",
            rngs={"dropout": rng} if train else None,
        )
        logits, _ = self.module_apply(
            "head", params, state, enc, mutable_state=[]
        )
        ns = self.merge_state(state, "frontend", u0)
        return (logits, sub_targets, sub_mask), ns

    def compute_objectives(self, predictions, batch, stage):
        logits, targets, mask = predictions
        loss = compute_brq_loss(logits, targets, mask)
        return loss, {"acc": brq_accuracy(logits, targets, mask)}

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p = {}
        p["quantizer"], _ = self.init_module(rng, "quantizer", feats)
        p["frontend"], s_f = self.init_module(rng, "frontend", feats,
                                              train=False)
        x, _ = self.module_apply(
            "frontend", {"frontend": p["frontend"]},
            {k: {"frontend": v} for k, v in s_f.items()}, feats,
            train=False,
        )
        p["encoder"], _ = self.init_module(rng, "encoder", x,
                                           method="encode")
        enc, _ = self.module_apply(
            "encoder", {"encoder": p["encoder"]}, {}, x, method="encode"
        )
        p["head"], _ = self.init_module(rng, "head", enc)
        out = {"params": p}
        for coll, tree in s_f.items():
            out[coll] = {"frontend": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
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
        if split == "train":
            ds = ds.filtered_sorted(sort_key="length")
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
        sys.path.insert(0, str(Path(__file__).parents[1] / "wav2vec2"))
        from train import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    # the quantizer must stay frozen: zero its learning rate via a mask
    import optax as _optax

    def opt_class():
        tx = _optax.inject_hyperparams(_optax.adamw)(
            learning_rate=hparams["lr"]
        )
        return _optax.multi_transform(
            {"train": tx, "frozen": _optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if any(getattr(k, "key", None) == "quantizer" for k in path)
                else "train",
                params,
            ),
        )

    brain = BestRQ(
        modules=hparams["modules"],
        opt_class=opt_class,
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
