#!/usr/bin/env python
"""BayesSpeech: Bayesian transformer ASR via Bayes by Backprop (the
reference's recipes/LibriSpeech/ASR/transformer/train_bayesspeech.py,
arXiv:2301.11276, re-expressed for speechbrain_tpu).

The reference wraps torch modules with the external ``bayestorch``
package; here the variational posterior is a PYTREE transform — every
weight w gets (mu, rho), a step samples w = mu + softplus(rho) * eps
by reparameterization and runs the standard CTC+attention forward,
and the objective adds the closed-form KL(q || N(0, prior_std))
between the diagonal-Gaussian posterior and the prior, scaled by
``kl_div_weight``. No module changes needed — the functional core
makes "Bayesianize the whole model" a tree_map.

Run: python train_bayesspeech.py hparams/bayesspeech.yaml \
    --data_folder=...
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
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

RHO_INIT = -5.0  # softplus(-5) ~ 6.7e-3 initial posterior std


def _sample_weights(var_params, rng, stochastic):
    """Reparameterized draw from the diagonal-Gaussian posterior."""
    mu, rho = var_params["mu"], var_params["rho"]
    if not stochastic:
        return mu
    leaves, treedef = jax.tree_util.tree_flatten(mu)
    keys = jax.random.split(rng, len(leaves))
    eps = treedef.unflatten(
        [jax.random.normal(k, l.shape, l.dtype) for k, l in
         zip(keys, leaves)]
    )
    return jax.tree_util.tree_map(
        lambda m, r, e: m + jax.nn.softplus(r) * e, mu, rho, eps
    )


def _kl_to_prior(var_params, prior_std):
    """Closed-form KL( N(mu, sigma) || N(0, prior_std) ), summed over
    every weight (Bayes-by-Backprop complexity loss)."""
    def kl_leaf(m, r):
        sigma = jax.nn.softplus(r)
        return jnp.sum(
            jnp.log(prior_std / sigma)
            + (sigma**2 + m**2) / (2.0 * prior_std**2) - 0.5
        )

    kls = jax.tree_util.tree_map(
        kl_leaf, var_params["mu"], var_params["rho"]
    )
    return jax.tree_util.tree_reduce(jnp.add, kls, jnp.float32(0.0))


class BayesASR(sb.Brain):
    """Variational-posterior conformer CTC/attention."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        k_sample, k_drop = (
            jax.random.split(rng) if rng is not None
            else (jax.random.PRNGKey(0), None)
        )
        theta = _sample_weights(params, k_sample, stochastic=train)

        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        feats, u0 = self.module_apply(
            "frontend", theta, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": k_drop} if train else None,
        )
        (enc, dec), _ = self.module_apply(
            "model", theta, state, feats, tokens_bos, wav_len=wav_lens,
            train=train, mutable_state=[],
            rngs={"dropout": k_drop} if train else None,
        )
        ctc_logits, _ = self.module_apply(
            "ctc_head", theta, state, enc, mutable_state=[]
        )
        seq_logits, _ = self.module_apply(
            "seq_head", theta, state, dec, mutable_state=[]
        )
        ns = self.merge_state(state, "frontend", u0)
        return (
            jax.nn.log_softmax(ctc_logits, -1),
            jax.nn.log_softmax(seq_logits, -1),
            params,
        ), ns

    def compute_objectives(self, predictions, batch, stage):
        p_ctc, p_seq, var_params = predictions
        wavs, wav_lens = batch["sig"]
        tokens, tok_lens = batch["tokens"]
        tokens_eos, tok_eos_lens = batch["tokens_eos"]
        w = self.hparams.ctc_weight
        likelihood = w * ctc_loss(
            p_ctc, tokens, wav_lens, tok_lens,
            blank_index=self.hparams.blank_index,
        ) + (1 - w) * kldiv_loss(
            p_seq, tokens_eos, length=tok_eos_lens,
            label_smoothing=self.hparams.label_smoothing,
        )
        complexity = _kl_to_prior(var_params, self.hparams.prior_std)
        return likelihood + self.hparams.kl_div_weight * complexity

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        feats = self.hparams.compute_features(wavs)
        p_f, s_f = self.init_module(rng, "frontend", feats, train=False)
        feats2, _ = self.module_apply(
            "frontend", {"frontend": p_f},
            {k: {"frontend": v} for k, v in s_f.items()}, feats, train=False,
        )
        p_m, _ = self.init_module(rng, "model", feats2, tokens_bos)
        (enc, dec), _ = self.module_apply(
            "model", {"model": p_m}, {}, feats2, tokens_bos
        )
        p_c, _ = self.init_module(rng, "ctc_head", enc)
        p_s, _ = self.init_module(rng, "seq_head", dec)
        mu = {"frontend": p_f, "model": p_m, "ctc_head": p_c,
              "seq_head": p_s}
        rho = jax.tree_util.tree_map(
            lambda t: jnp.full_like(t, RHO_INIT), mu
        )
        out = {"params": {"mu": mu, "rho": rho}}
        for coll, tree in s_f.items():
            out[coll] = {"frontend": tree}
        return out

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        if should_step:
            old_lr, new_lr = self.hparams.noam_scheduler(None)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch,
                        "lr": self.hparams.noam_scheduler.current_lr},
            train_stats={"loss": self.train_loss},
            valid_stats={"loss": stage_loss},
        )
        self.save_checkpoint(meta={"loss": stage_loss}, min_keys=["loss"])


def dataio_prepare(hparams, tokenizer):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        if split == "train":
            ds = ds.filtered_sorted(sort_key="length")
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(words):
            ids = tokenizer.sp.encode_as_ids(words)
            yield np.asarray(ids, np.int32)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="words",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens", "tokens_bos", "tokens_eos"]
        )
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
    if run_opts.get("debug") and not Path(
        hparams["train_annotation"]
    ).exists():
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(
            hparams["data_folder"],
            save_folder=Path(hparams["train_annotation"]).parent,
        )
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_annotation"],
        annotation_read="words",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = BayesASR(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adamw)(
            learning_rate=hparams["lr_adam"]
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
                             "shuffle": True,
                             "pad_to_multiple": {"sig": 16000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 16000}},
    )
