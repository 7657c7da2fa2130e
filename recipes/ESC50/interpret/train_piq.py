#!/usr/bin/env python
"""Posthoc Interpretation via Quantization (PIQ) training (the
reference's recipes/ESC50/interpret/train_piq.py re-expressed for
speechbrain_tpu): a FROZEN Cnn14 classifier provides feature maps;
VectorQuantizedPSI_Audio reconstructs the class-partitioned quantized
log-power spectrogram. Loss = reconstruction + VQ commitment/codebook
terms (ref train_piq.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class PIQBrain(sb.Brain):
    def _spectrogram(self, wavs):
        X = self.hparams.compute_stft(wavs)
        Xp = spectral_magnitude(X, power=self.hparams.spec_mag_power)
        return jnp.log1p(Xp)  # (B, T, F)

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        labels, _ = batch["class_encoded"]
        labels = jnp.asarray(labels).reshape(-1)
        feats = self.hparams.compute_features(wavs)
        X = self._spectrogram(wavs)
        (emb, reps), _ = self.module_apply(
            "embedding_model", params, state, feats, train=False
        )
        hs = jax.lax.stop_gradient(reps[0])  # coarsest map
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        (xhat, hcat, z_q), u_psi = self.module_apply(
            "psi", params, state, hs, labels=labels, train=train,
            stage="TRAIN" if train else "VALID", mutable_state=mut,
        )
        ns = self.merge_state(state, "psi", u_psi)
        return (X, xhat, hcat, z_q), ns

    def compute_objectives(self, pred, batch, stage):
        X, xhat, hcat, z_q = pred
        xhat = xhat[..., 0]  # (B, T', F')
        T = min(X.shape[1], xhat.shape[1])
        F = min(X.shape[2], xhat.shape[2])
        rec = jnp.mean((xhat[:, :T, :F] - X[:, :T, :F]) ** 2)
        # VQ terms: codebook pulls to encoder output, commitment reverse
        vq = jnp.mean((z_q - jax.lax.stop_gradient(hcat)) ** 2)
        commit = jnp.mean((hcat - jax.lax.stop_gradient(z_q)) ** 2)
        loss = rec + vq + self.hparams.commit_weight * commit
        return loss, {"rec": rec, "vq": vq}

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        labels = jnp.zeros((wavs.shape[0],))
        feats = self.hparams.compute_features(wavs)
        p_emb, s_emb = self.init_module(
            rng, "embedding_model", feats, train=False
        )
        (emb, reps), _ = self.module_apply(
            "embedding_model", {"embedding_model": p_emb},
            {k: {"embedding_model": v} for k, v in s_emb.items()},
            feats, train=False,
        )
        p_psi, s_psi = self.init_module(
            rng, "psi", reps[0], labels=labels, train=False, stage="VALID"
        )
        out = {"params": {"embedding_model": p_emb, "psi": p_psi}}
        for coll in set(s_emb) | set(s_psi):
            out[coll] = {}
            if coll in s_emb:
                out[coll]["embedding_model"] = s_emb[coll]
            if coll in s_psi:
                out[coll]["psi"] = s_psi[coll]
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
    brain = PIQBrain(
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
                             "shuffle": True, "pad_to_multiple": 2048},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": 2048},
    )
