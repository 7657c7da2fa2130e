#!/usr/bin/env python
"""Listen-to-Interpret (L2I) posthoc interpreter training (the
reference's recipes/ESC50/interpret/train_l2i.py re-expressed for
speechbrain_tpu): a FROZEN Cnn14 classifier provides multi-resolution
feature maps; Psi predicts NMF time activations from them; the (frozen,
NMF-pretrained) NMFDecoderAudio reconstructs the log1p power
spectrogram; Theta classifies from the activations. Loss = spectral
reconstruction + fidelity CE(theta, classifier prediction) + L1
sparsity on the activations (ref train_l2i.py:179)."""

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


class L2IBrain(sb.Brain):
    def _spectrogram(self, wavs):
        X = self.hparams.compute_stft(wavs)
        Xp = spectral_magnitude(X, power=self.hparams.spec_mag_power)
        return jnp.log1p(jnp.moveaxis(Xp, 1, 2))  # (B, F, T)

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        feats = self.hparams.compute_features(wavs)
        X = self._spectrogram(wavs)
        # frozen classifier: embeddings + feature maps + class posterior
        (emb, reps), _ = self.module_apply(
            "embedding_model", params, state, feats, train=False
        )
        if emb.ndim == 4:  # conv2d encoders: (B, T', F', C)
            emb = jnp.mean(emb, axis=(1, 2))[:, None]
        else:
            emb = jnp.mean(emb, axis=1, keepdims=True)
        logits, _ = self.module_apply(
            "classifier", params, state, emb, mutable_state=[]
        )
        pred_class = jnp.argmax(
            jax.lax.stop_gradient(logits[:, 0]), axis=-1
        )
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        # only psi + theta train: cut the gradient INTO the frozen
        # classifier (reps) and apply the frozen NMF dictionary with
        # stop_gradient'd params (plain adam then leaves both untouched)
        reps = [jax.lax.stop_gradient(r) for r in reps]
        H, u_psi = self.module_apply(
            "psi", params, state, reps, train=train, mutable_state=mut
        )
        theta_out, _ = self.module_apply("theta", params, state, H)
        frozen_dec = {
            "nmf_decoder": jax.tree_util.tree_map(
                jax.lax.stop_gradient, params["nmf_decoder"]
            )
        }
        Xhat, _ = self.module_apply("nmf_decoder", frozen_dec, state, H)
        ns = self.merge_state(state, "psi", u_psi)
        return (X, Xhat, H, theta_out, pred_class), ns

    def compute_objectives(self, pred, batch, stage):
        X, Xhat, H, theta_out, pred_class = pred
        T = min(X.shape[-1], Xhat.shape[-1])
        rec = jnp.mean((Xhat[..., :T] - X[..., :T]) ** 2)
        fid = -jnp.mean(
            jnp.log(
                jnp.take_along_axis(
                    theta_out, pred_class[:, None], axis=1
                )[:, 0] + 1e-8
            )
        )
        sparsity = jnp.mean(jnp.abs(H))
        loss = (
            rec
            + self.hparams.fid_weight * fid
            + self.hparams.sparsity_weight * sparsity
        )
        return loss, {"rec": rec, "fid": fid}

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p_emb, s_emb = self.init_module(
            rng, "embedding_model", feats, train=False
        )
        (emb, reps), _ = self.module_apply(
            "embedding_model", {"embedding_model": p_emb},
            {k: {"embedding_model": v} for k, v in s_emb.items()},
            feats, train=False,
        )
        if emb.ndim == 4:
            emb = jnp.mean(emb, axis=(1, 2))[:, None]
        else:
            emb = jnp.mean(emb, axis=1, keepdims=True)
        p_cls, _ = self.init_module(rng, "classifier", emb)
        p_psi, s_psi = self.init_module(rng, "psi", reps, train=False)
        H, _ = self.module_apply(
            "psi", {"psi": p_psi},
            {k: {"psi": v} for k, v in s_psi.items()}, reps, train=False,
        )
        p_theta, _ = self.init_module(rng, "theta", H)
        p_dec, _ = self.init_module(rng, "nmf_decoder", H)
        out = {
            "params": {
                "embedding_model": p_emb, "classifier": p_cls,
                "psi": p_psi, "theta": p_theta, "nmf_decoder": p_dec,
            }
        }
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
    brain = L2IBrain(
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
