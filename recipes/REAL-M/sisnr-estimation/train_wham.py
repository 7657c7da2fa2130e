#!/usr/bin/env python
"""REAL-M blind SI-SNR estimation trained on WHAM!-style noisy mixtures
(the reference's recipes/REAL-M/sisnr-estimation/train_wham.py
re-expressed for speechbrain_tpu): the same blind estimator as
``train.py``, but the training mixtures additionally carry real
recorded noise (the WHAM! noise corpus), so the estimator stays
calibrated on noisy real-world separator outputs.

Run: python train_wham.py hparams/train_wham.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import cal_si_snr
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

sys.path.insert(0, str(Path(__file__).parent))
from train import SISNREstBrain  # noqa: E402


class NoisySISNREstBrain(SISNREstBrain):
    """Adds recorded noise to the mixture before estimating SI-SNR
    (reference train_wham.py:59-75: mix = mix + noise, truncated to the
    common length)."""

    def make_pairs(self, batch, rng):
        s1, _ = batch["s1_sig"]
        s2, _ = batch["s2_sig"]
        noise, _ = batch["noise_sig"]
        k1, k2 = jax.random.split(rng)
        T = min(s1.shape[1], noise.shape[1])
        gain = jax.random.uniform(k1, (s1.shape[0], 1), minval=0.1,
                                  maxval=1.0)
        mix = s1[:, :T] + s2[:, :T] + gain * noise[:, :T]
        alpha = jax.random.uniform(k2, (s1.shape[0], 1), minval=0.0,
                                   maxval=0.5)
        est = s1[:, :T] + alpha * s2[:, :T]
        true = cal_si_snr(s1[:, :T, None], est[..., None])
        true = jnp.clip(true.reshape(-1), self.hparams.snr_min,
                        self.hparams.snr_max)
        return mix, est, true


def dataio_prepare(hparams):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="s1_wav", provides="s1_sig")
        ds.add_dynamic_item(read_audio, takes="s2_wav", provides="s2_sig")
        # WHAM! noise track: recorded noise aligned with the mixture;
        # the synthetic debug prepare stores it under noise_wav (falls
        # back to the mixture minus sources when absent)
        first = next(iter(ds.data.values()))
        noise_key = "noise_wav" if "noise_wav" in first else "mix_wav"
        ds.add_dynamic_item(read_audio, takes=noise_key,
                            provides="noise_sig")
        ds.set_output_keys(["id", "s1_sig", "s2_sig", "noise_sig"])
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
        # the WHAM separation prepare writes mixtures + sources + noise
        sys.path.insert(
            0,
            str(Path(__file__).parents[2] / "WHAMandWHAMR" / "separation"),
        )
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = NoisySISNREstBrain(
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
