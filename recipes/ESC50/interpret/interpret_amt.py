#!/usr/bin/env python
"""ESC-50 interpretation by activation-map thresholding (AMT): the
reference's recipes/ESC50/interpret/interpret_amt.py re-expressed for
speechbrain_tpu. The classifier trains normally (NLL); at validation a
saliency map over the input spectrogram is derived from the model
itself and thresholded into a binary interpretation mask whose masked
spectrogram is scored again — the "faithfulness" check (AI: does the
masked input keep the predicted class).

Saliency source per backbone:
* ViTEncoder — CLS-token attention rollout across layers reshaped to
  the patch grid (the reference's transformer path,
  ref interpret_amt.py:111-139).
* FocalNetEncoder — L2 energy of the frame embeddings over time (the
  focal stack exposes no attention; the modulator-energy profile is the
  same quantity the reference visualises for conv backbones).

Run: python interpret_amt.py hparams/amt_vit.yaml --data_folder=...
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
from speechbrain_tpu.nnet.losses import classification_error, nll_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class AMTBrain(sb.Brain):
    def _encode(self, params, state, feats, train):
        mut = ["batch_stats"] if train else []
        emb, u1 = self.module_apply(
            "embedding_model", params, state, feats, train=train,
            mutable_state=mut,
        )
        attns = None
        if isinstance(emb, tuple):
            emb, attns = emb
        return emb, attns, u1

    def _classify(self, params, state, emb):
        pooled = jnp.mean(emb, axis=1, keepdims=True)
        logits, _ = self.module_apply(
            "classifier", params, state, pooled, mutable_state=[]
        )
        if logits.ndim == 3:
            logits = logits[:, 0]
        return jax.nn.log_softmax(logits, axis=-1)

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        feats = self.hparams.compute_features(wavs)
        emb, attns, u1 = self._encode(params, state, feats, train)
        logp = self._classify(params, state, emb)
        ns = self.merge_state(state, "embedding_model", u1)
        extra = None
        if not train:
            # faithfulness: re-classify the threshold-masked input
            sal = self.saliency(feats, emb, attns)
            mask = (sal >= self.hparams.mask_threshold).astype(feats.dtype)
            emb_m, _, _ = self._encode(params, state, feats * mask, False)
            logp_m = self._classify(params, state, emb_m)
            extra = (logp_m, jnp.mean(mask))
        return (logp, extra), ns

    def saliency(self, feats, emb, attns):
        """(B, T, F) saliency in [0, 1] from the backbone's own maps."""
        B, T, F = feats.shape
        if attns:
            # attention rollout: average heads, multiply layers,
            # read the CLS row over the patch tokens
            roll = None
            for a in attns:
                if a.ndim == 4:  # (B, heads, N, N)
                    a = jnp.mean(a, axis=1)
                eye = jnp.eye(a.shape[-1])[None]
                a = 0.5 * a + 0.5 * eye  # residual-aware rollout
                roll = a if roll is None else roll @ a
            cls_to_patches = roll[:, 0, 1:]  # (B, N_patches)
            pt, pf = self.hparams.patch_t, self.hparams.patch_f
            gt, gf = T // pt, F // pf
            sal = cls_to_patches[:, : gt * gf].reshape(B, gt, gf)
            sal = jax.image.resize(sal, (B, T, F), "nearest")
        else:
            # frame-energy profile broadcast over frequency
            prof = jnp.linalg.norm(emb, axis=-1)  # (B, T')
            prof = jax.image.resize(prof, (B, T), "linear")
            sal = jnp.tile(prof[:, :, None], (1, 1, F))
        lo = sal.min(axis=(1, 2), keepdims=True)
        hi = sal.max(axis=(1, 2), keepdims=True)
        return (sal - lo) / (hi - lo + 1e-9)

    def compute_objectives(self, outputs, batch, stage):
        logp, extra = outputs
        cls, _ = batch["class_encoded"]
        cls = jnp.asarray(cls).reshape(-1)
        metrics = {"error": classification_error(logp, cls)}
        if extra is not None:
            logp_m, coverage = extra
            keep = (
                jnp.argmax(logp_m, -1) == jnp.argmax(logp, -1)
            ).astype(jnp.float32)
            metrics["faithfulness"] = jnp.mean(keep)
            metrics["mask_coverage"] = coverage
        return nll_loss(logp, cls), metrics

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p1, s1 = self.init_module(rng, "embedding_model", feats,
                                  train=False)
        emb, _ = self.module_apply(
            "embedding_model", {"embedding_model": p1},
            {k: {"embedding_model": v} for k, v in s1.items()},
            feats, train=False,
        )
        emb = emb[0] if isinstance(emb, tuple) else emb
        pooled = jnp.mean(emb, axis=1, keepdims=True)
        p2, _ = self.init_module(rng, "classifier", pooled)
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
            lambda c: np.asarray([encoder.encode_label(c)], np.int32),
            takes="class_name", provides="class_encoded",
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
    brain = AMTBrain(
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
