#!/usr/bin/env python
"""VoiceBank MetricGAN-U unsupervised enhancement (the reference's
recipes/Voicebank/enhance/MetricGAN-U/train.py re-expressed for
speechbrain_tpu): no clean targets — the discriminator learns to
predict a NON-INTRUSIVE metric (native SRMR-like modulation ratio,
processing/srmr.py; the reference calls the external SRMRpy/DNSMOS) of
enhanced spectrograms, and the generator maximizes the predicted score.
STOI (nnet/loss/stoi_loss.py) is tracked against clean references for
evaluation only, exactly like the reference's stoi_metric
(ref train.py:263).

Expects JSON manifests {utt: {"noisy_wav": p, "clean_wav": p,
"length": s}} (clean used only for eval metrics).
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
from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss
from speechbrain_tpu.processing.signal_processing import resynthesize
from speechbrain_tpu.processing.srmr import srmr_batch
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class MetricGanUBrain(sb.Brain):
    """Alternating D/G updates with a host-side non-intrusive target."""

    def spec_mag(self, wavs):
        return jnp.sqrt(self.hparams.compute_stft.power(wavs) + 1e-8)

    def enhance_mag(self, params, noisy_mag, train, rng):
        mask, _ = self.module_apply(
            "generator", params, {}, noisy_mag, train=train,
            rngs={"dropout": rng} if train else None, mutable_state=[],
        )
        return noisy_mag * mask

    def d_loss_fn(self, params, state, batch, rng):
        est_mag, target = batch
        d_est, u1 = self.module_apply(
            "discriminator", params, state, est_mag[..., None],
            train=True, mutable_state=["batch_stats"],
        )
        state = self.merge_state(state, "discriminator", u1)
        return jnp.mean((d_est[:, 0] - target) ** 2), state

    def g_loss_fn(self, params, state, batch, rng):
        noisy_mag, target_high = batch
        est = self.enhance_mag(params, noisy_mag, True, rng)
        d_out, _ = self.module_apply(
            "discriminator", params, state, est[..., None], train=True,
            mutable_state=["batch_stats"],
        )
        # G drives the predicted metric toward the running best score
        return jnp.mean((d_out[:, 0] - target_high) ** 2), state

    def resynth(self, est_mag, noisy):
        return resynthesize(
            est_mag, noisy, self.hparams.compute_stft,
            self.hparams.compute_istft,
        )


def prepare_synthetic(data_folder, n_utts=8, sample_rate=16000, seed=0):
    """Tiny noisy/clean pairs (clean only for eval) for --debug runs."""
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    T = sample_rate
    t = np.arange(T) / sample_rate
    for i in range(n_utts):
        am = 0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * t)
        clean = (0.5 * am * np.sin(2 * np.pi * (200 + 50 * i) * t)
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
    brain = MetricGanUBrain(
        modules=hparams["modules"],
        opt_class=lambda: optax.adam(hparams["lr"]),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    loader = brain.make_dataloader(
        datasets["train"], sb.Stage.TRAIN, ckpt_prefix=None,
        batch_size=hparams["batch_size"], shuffle=True,
        pad_to_multiple={"noisy_sig": 2048, "clean_sig": 2048},
    )
    eb = brain._prepare_batch(next(iter(loader)))
    noisy, lens = eb["noisy_sig"]
    noisy_mag = brain.spec_mag(noisy)
    k = jax.random.PRNGKey(hparams["seed"])
    p_g, _ = brain.init_module(k, "generator", noisy_mag, train=False)
    p_d, s_d = brain.init_module(
        k, "discriminator", noisy_mag[..., None], train=False
    )
    brain.params = {"generator": p_g, "discriminator": p_d}
    brain.model_state = {
        coll: {"discriminator": tree} for coll, tree in s_d.items()
    }
    brain.init_optimizers()
    d_step, g_step = brain.make_gan_steps(
        brain.d_loss_fn, brain.g_loss_fn, "discriminator", "generator"
    )
    enhance_j = jax.jit(
        lambda p, m: brain.enhance_mag(p, m, False, None)
    )

    params, opt_state = brain.params, brain.opt_state
    state = brain.model_state
    debug_batches = run_opts.get("debug_batches") or 0
    # non-intrusive target metric (ref train.py:328 dispatches on
    # target_metric in {"srmr", "dnsmos"})
    target_metric = hparams.get("target_metric", "srmr")
    if target_metric == "srmr":
        metric_fn = lambda wav, lens: np.tanh(
            srmr_batch(wav, lens) / hparams["srmr_scale"]
        )
    elif target_metric == "dnsmos":
        # DNSMOS is a gated external service (the reference posts wavs
        # to the DNS-challenge web API with a key from
        # dns_challenge@microsoft.com, ref train.py:43,102-131). Any
        # callable (wav_batch, lens) -> normalized scores can be
        # injected through hparams["dnsmos_fn"]; without one the run
        # fails with the same gate as the reference.
        metric_fn = hparams.get("dnsmos_fn")
        if metric_fn is None:
            raise RuntimeError(
                "target_metric=dnsmos needs hparams['dnsmos_fn'] (a "
                "callable scoring enhanced waveforms). The official "
                "DNSMOS is a web service: ask the key from the DNS "
                "organizer dns_challenge@microsoft.com and wrap the "
                "API call, or inject any local non-intrusive scorer."
            )
    else:
        raise ValueError(f"unknown target_metric {target_metric!r}")
    # the metric scale the generator chases (running best, ref target=1
    # after metric normalization)
    target_high = float(hparams.get("target_score", 1.0))
    for epoch in hparams["epoch_counter"]:
        d_losses, g_losses, stois = [], [], []
        for i, batch in enumerate(loader):
            if run_opts.get("debug") and debug_batches and i >= debug_batches:
                break
            db = brain._prepare_batch(batch)
            noisy, lens = db["noisy_sig"]
            clean, _ = db["clean_sig"]
            noisy_mag = brain.spec_mag(noisy)
            est_mag = enhance_j(params, noisy_mag)
            est_wav = np.asarray(brain.resynth(est_mag, noisy))
            # non-intrusive D target, squashed to [0, 1] like the
            # reference's normalized srmr/dnsmos targets
            target = jnp.asarray(metric_fn(est_wav, lens), jnp.float32)
            params, state, opt_state, d_l = d_step(
                params, state, opt_state, (est_mag, target), k
            )
            params, state, opt_state, g_l = g_step(
                params, state, opt_state, (noisy_mag, target_high), k
            )
            d_losses.append(float(d_l))
            g_losses.append(float(g_l))
            stois.append(float(stoi_loss(est_wav, np.asarray(clean), lens)))
        brain.params, brain.opt_state, brain.model_state = (
            params, opt_state, state,
        )
        hparams["train_logger"].log_stats(
            stats_meta={"epoch": epoch},
            train_stats={
                "d_loss": float(np.mean(d_losses)),
                "g_loss": float(np.mean(g_losses)),
                "stoi_loss": float(np.mean(stois)),
            },
        )
        brain.save_checkpoint(meta={"g_loss": float(np.mean(g_losses))},
                              min_keys=["g_loss"])
        if run_opts.get("debug") and run_opts.get("debug_epochs") and \
                epoch >= run_opts["debug_epochs"]:
            break


if __name__ == "__main__":
    main()
