#!/usr/bin/env python
"""Listenable Maps for Audio Classifiers (L-MAC) training (the
reference's recipes/ESC50/interpret/train_lmac.py re-expressed for
speechbrain_tpu): a FROZEN Cnn14 classifier; CNN14PSI_stft decodes a
sigmoid saliency mask on the STFT grid from its feature maps. The mask
is trained so the masked-IN spectrogram keeps the classifier's decision
(cross-entropy to the original prediction) while the masked-OUT
spectrogram loses it, plus L1 mask regularization
(ref train_lmac.py: l_in - alpha * l_out + reg)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class LMACBrain(sb.Brain):
    def _classify(self, params, state, feats):
        (emb, reps), _ = self.module_apply(
            "embedding_model", params, state, feats, train=False
        )
        emb = jnp.mean(emb, axis=1, keepdims=True)
        logits, _ = self.module_apply(
            "classifier", params, state, emb, mutable_state=[]
        )
        return jax.nn.log_softmax(logits[:, 0], axis=-1), reps

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, _ = batch["sig"]
        feats = self.hparams.compute_features(wavs)
        logp, reps = self._classify(params, state, feats)
        pred_class = jnp.argmax(jax.lax.stop_gradient(logp), axis=-1)
        reps = [jax.lax.stop_gradient(r) for r in reps]
        mask, _ = self.module_apply("decoder", params, state, reps)
        mask = mask[..., 0]  # (B, T', F')
        # resize the mask to the mel grid and classify masked in/out
        B, T, F = feats.shape
        mask = jax.image.resize(mask, (B, T, F), "bilinear")
        logp_in, _ = self._classify(params, state, feats * mask)
        logp_out, _ = self._classify(params, state, feats * (1.0 - mask))
        return (logp_in, logp_out, mask, pred_class), state

    def compute_objectives(self, pred, batch, stage):
        logp_in, logp_out, mask, pred_class = pred
        pick = lambda lp: jnp.take_along_axis(
            lp, pred_class[:, None], axis=1
        )[:, 0]
        l_in = -jnp.mean(pick(logp_in))
        l_out = -jnp.mean(pick(logp_out))
        reg = jnp.mean(jnp.abs(mask))
        loss = (
            l_in
            - self.hparams.out_weight * l_out
            + self.hparams.reg_weight * reg
        )
        return loss, {"l_in": l_in, "l_out": l_out, "mask_mean": reg}

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
        emb = jnp.mean(emb, axis=1, keepdims=True)
        p_cls, _ = self.init_module(rng, "classifier", emb)
        p_dec, _ = self.init_module(rng, "decoder", reps)
        out = {
            "params": {
                "embedding_model": p_emb, "classifier": p_cls,
                "decoder": p_dec,
            }
        }
        for coll, tree in s_emb.items():
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
    brain = LMACBrain(
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
