#!/usr/bin/env python
"""VoiceBank SEGAN enhancement (the reference's
recipes/Voicebank/enhance/SEGAN/train.py re-expressed for
speechbrain_tpu): waveform-domain GAN — the Generator autoencodes noisy
segments with skip connections and a latent z; the Discriminator judges
(noisy, clean) vs (noisy, enhanced) pairs (LSGAN); the generator adds
an L1 waveform term (ref train.py losses)."""

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


class SeganBrain(sb.Brain):
    def gen(self, params, noisy, rng, train):
        out, _ = self.module_apply(
            "generator", params, {}, noisy,
            rngs={"noise": rng}, mutable_state=[],
        )
        return out

    def d_loss_fn(self, params, state, batch, rng):
        noisy, clean = batch
        fake = jax.lax.stop_gradient(self.gen(params, noisy, rng, True))
        d_real, _ = self.module_apply(
            "discriminator", params, state,
            jnp.stack([noisy, clean], -1), train=True, mutable_state=[],
        )
        d_fake, _ = self.module_apply(
            "discriminator", params, state,
            jnp.stack([noisy, fake], -1), train=True, mutable_state=[],
        )
        return (
            jnp.mean((d_real - 1.0) ** 2) + jnp.mean(d_fake**2)
        ), state

    def g_loss_fn(self, params, state, batch, rng):
        noisy, clean = batch
        fake = self.gen(params, noisy, rng, True)
        d_fake, _ = self.module_apply(
            "discriminator", params, state,
            jnp.stack([noisy, fake], -1), train=True, mutable_state=[],
        )
        adv = jnp.mean((d_fake - 1.0) ** 2)
        l1 = jnp.mean(jnp.abs(fake - clean))
        return adv + self.hparams.l1_weight * l1, state


def prepare_synthetic(data_folder, n_utts=8, sample_rate=16000, seed=0):
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
        cp, npth = root / f"clean_{i}.wav", root / f"noisy_{i}.wav"
        write_audio(str(cp), clean, sample_rate)
        write_audio(str(npth), noisy, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"u{i}"] = {
            "clean_wav": str(cp), "noisy_wav": str(npth),
            "length": T / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def dataio_prepare(hparams):
    seg = hparams["segment_size"]
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )

        def pair_pipeline(noisy_wav, clean_wav):
            n = np.asarray(read_audio(noisy_wav))
            c = np.asarray(read_audio(clean_wav))
            L = min(len(n), len(c))
            if L < seg:
                n = np.pad(n[:L], (0, seg - L))
                c = np.pad(c[:L], (0, seg - L))
                start = 0
            else:
                start = int(rng.integers(0, L - seg + 1))
            yield n[start:start + seg]
            yield c[start:start + seg]

        ds.add_dynamic_item(
            pair_pipeline, takes=["noisy_wav", "clean_wav"],
            provides=["noisy_sig", "clean_sig"],
        )
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
    brain = SeganBrain(
        modules=hparams["modules"],
        opt_class=lambda: optax.adam(hparams["lr"]),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    loader = brain.make_dataloader(
        datasets["train"], sb.Stage.TRAIN, ckpt_prefix=None,
        batch_size=hparams["batch_size"], shuffle=True,
    )
    eb = brain._prepare_batch(next(iter(loader)))
    noisy, _ = eb["noisy_sig"]
    k = jax.random.PRNGKey(hparams["seed"])
    gmod = brain.modules.generator
    v_g = dict(gmod.init(
        {"params": k, "noise": jax.random.fold_in(k, 1)}, noisy,
    ))
    p_g = v_g.pop("params")
    p_d, _ = brain.init_module(
        k, "discriminator", jnp.stack([noisy, noisy], -1), train=False
    )
    brain.params = {"generator": p_g, "discriminator": p_d}
    brain.model_state = {}
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
            noisy, _ = db["noisy_sig"]
            clean, _ = db["clean_sig"]
            params, state, opt_state, d_l = d_step(
                params, state, opt_state, (noisy, clean),
                jax.random.fold_in(k, 2 * i),
            )
            params, state, opt_state, g_l = g_step(
                params, state, opt_state, (noisy, clean),
                jax.random.fold_in(k, 2 * i + 1),
            )
            d_losses.append(float(d_l))
            g_losses.append(float(g_l))
        brain.params, brain.opt_state = params, opt_state
        hparams["train_logger"].log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"d_loss": float(np.mean(d_losses)),
                         "g_loss": float(np.mean(g_losses))},
        )
        brain.save_checkpoint(meta={"g_loss": float(np.mean(g_losses))},
                              min_keys=["g_loss"])
        if run_opts.get("debug") and epoch >= (
            run_opts.get("debug_epochs") or 1
        ):
            break


if __name__ == "__main__":
    main()
