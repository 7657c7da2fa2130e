#!/usr/bin/env python
"""VoiceBank MetricGAN+ enhancement training (the reference's
recipes/Voicebank/enhance/MetricGAN/train.py, re-expressed for
speechbrain_tpu): a BLSTM spectral masker (generator) trained
adversarially against a CNN metric predictor (discriminator) that
learns to estimate an intelligibility proxy of (enhanced, clean) pairs
— alternating updates via ``Brain.make_gan_steps``.

The metric surrogate here is a differentiable STOI-like band
correlation (the reference calls the real PESQ/STOI binaries host-side;
a pluggable ``metric_fn`` keeps that door open).

Expects JSON manifests {utt: {"noisy_wav": p, "clean_wav": p,
"length": s}}.
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
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


def band_correlation_metric(est_mag, clean_mag, lens=None):
    """Differentiable STOI-ish proxy: mean per-band correlation between
    enhanced and clean magnitude envelopes, in [-1, 1]."""
    def norm(x):
        x = x - x.mean(axis=1, keepdims=True)
        return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8)

    corr = jnp.sum(norm(est_mag) * norm(clean_mag), axis=1)  # (B, F)
    return corr.mean(axis=-1)  # (B,)


class MetricGanBrain(sb.Brain):
    """Alternating D/G updates (reference MetricGAN fit_batch)."""

    def spec_mag(self, wavs):
        """Magnitude spectrogram via the STFT power fast path."""
        return jnp.sqrt(self.hparams.compute_stft.power(wavs) + 1e-8)

    def enhance(self, params, noisy_mag, train, rng):
        mask, _ = self.module_apply(
            "generator", params, {}, noisy_mag, train=train,
            rngs={"dropout": rng} if train else None, mutable_state=[],
        )
        return noisy_mag * mask

    def d_loss_fn(self, params, state, batch, rng):
        noisy_mag, clean_mag, lens = batch
        est = jax.lax.stop_gradient(
            self.enhance(params, noisy_mag, True, rng)
        )
        true_metric = band_correlation_metric(est, clean_mag, lens)
        pair_est = jnp.stack([est, clean_mag], axis=-1)
        pair_clean = jnp.stack([clean_mag, clean_mag], axis=-1)
        d_est, u1 = self.module_apply(
            "discriminator", params, state, pair_est, train=True,
            mutable_state=["batch_stats"],
        )
        d_clean, _ = self.module_apply(
            "discriminator", params, state, pair_clean, train=True,
            mutable_state=["batch_stats"],
        )
        state = self.merge_state(state, "discriminator", u1)
        # D learns the metric of enhanced pairs; clean pairs score 1
        loss = jnp.mean((d_est[:, 0] - true_metric) ** 2) + jnp.mean(
            (d_clean[:, 0] - 1.0) ** 2
        )
        return loss, state

    def g_loss_fn(self, params, state, batch, rng):
        noisy_mag, clean_mag, lens = batch
        est = self.enhance(params, noisy_mag, True, rng)
        pair = jnp.stack([est, clean_mag], axis=-1)
        d_out, _ = self.module_apply(
            "discriminator", params, state, pair, train=True,
            mutable_state=["batch_stats"],
        )
        # G maximizes the predicted metric (target = 1)
        return jnp.mean((d_out[:, 0] - 1.0) ** 2), state

    def make_batch(self, device_batch):
        noisy, lens = device_batch["noisy_sig"]
        clean, _ = device_batch["clean_sig"]
        return self.spec_mag(noisy), self.spec_mag(clean), lens



def prepare_synthetic(data_folder, n_utts=8, sample_rate=16000, seed=0):
    """Tiny noisy/clean pairs for --debug runs / recipe tests."""
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    T = sample_rate
    t = np.arange(T) / sample_rate
    for i in range(n_utts):
        clean = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                 ).astype(np.float32)
        noisy = clean + 0.2 * rng.standard_normal(T).astype(np.float32)
        cp = root / f"clean_{i}.wav"
        np_ = root / f"noisy_{i}.wav"
        write_audio(str(cp), clean, sample_rate)
        write_audio(str(np_), noisy, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"u{i}"] = {
            "clean_wav": str(cp), "noisy_wav": str(np_),
            "length": T / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def dataio_prepare(hparams):
    """Noisy/clean paired pipelines."""
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="noisy_wav",
                            provides="noisy_sig")
        ds.add_dynamic_item(read_audio, takes="clean_wav",
                            provides="clean_sig")
        ds.set_output_keys(["id", "noisy_sig", "clean_sig"])
        datasets[split] = ds
    return datasets


def main():
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
        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = MetricGanBrain(
        modules=hparams["modules"],
        opt_class=lambda: optax.adam(hparams["lr"]),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )

    # manual init from one example batch, then alternating GAN training
    loader = brain.make_dataloader(
        datasets["train"], sb.Stage.TRAIN, ckpt_prefix=None,
        batch_size=hparams["batch_size"], shuffle=True,
        pad_to_multiple={"noisy_sig": 2048, "clean_sig": 2048},
    )
    eb = brain._prepare_batch(next(iter(loader)))
    noisy_mag, clean_mag, lens = brain.make_batch(eb)
    k = jax.random.PRNGKey(hparams["seed"])
    p_g, _ = brain.init_module(k, "generator", noisy_mag, train=False)
    p_d, s_d = brain.init_module(
        k, "discriminator", jnp.stack([noisy_mag, clean_mag], -1),
        train=False,
    )
    brain.params = {"generator": p_g, "discriminator": p_d}
    brain.model_state = {
        coll: {"discriminator": tree} for coll, tree in s_d.items()
    }
    brain.init_optimizers()
    d_step, g_step = brain.make_gan_steps(
        brain.d_loss_fn, brain.g_loss_fn, "discriminator", "generator"
    )

    params, opt_state = brain.params, brain.opt_state
    state = brain.model_state
    debug_batches = run_opts.get("debug_batches") or 0
    for epoch in hparams["epoch_counter"]:
        d_losses, g_losses = [], []
        for i, batch in enumerate(loader):
            if run_opts.get("debug") and debug_batches and i >= debug_batches:
                break
            db = brain._prepare_batch(batch)
            b = brain.make_batch(db)
            params, state, opt_state, d_l = d_step(
                params, state, opt_state, b,
                jax.random.fold_in(k, 2 * i),
            )
            params, state, opt_state, g_l = g_step(
                params, state, opt_state, b,
                jax.random.fold_in(k, 2 * i + 1),
            )
            d_losses.append(float(d_l))
            g_losses.append(float(g_l))
        brain.params = params
        brain.opt_state = opt_state
        hparams["train_logger"].log_stats(
            stats_meta={"epoch": epoch},
            train_stats={
                "d_loss": sum(d_losses) / len(d_losses),
                "g_loss": sum(g_losses) / len(g_losses),
            },
        )
        brain.save_checkpoint(
            meta={"g_loss": sum(g_losses) / len(g_losses)},
            min_keys=["g_loss"],
        )
        if run_opts.get("debug") and epoch >= (
            run_opts.get("debug_epochs") or 1
        ):
            break


if __name__ == "__main__":
    main()
