#!/usr/bin/env python
"""LJSpeech DiffWave vocoder training (the reference's
recipes/LJSpeech/TTS/vocoder/diffwave/train.py re-expressed for
speechbrain_tpu): the DiffWave denoiser learns to predict the noise
added to audio segments conditioned on the mel spectrogram and a random
diffusion step (DenoisingDiffusion.train_sample); MSE noise objective.

Run: python train.py hparams/train.yaml --data_folder=...
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
from speechbrain_tpu.lobes.models.HifiGAN import mel_spectogram
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class DiffWaveBrain(sb.Brain):
    def mel_fn(self, audio):
        h = self.hparams
        return mel_spectogram(
            audio,
            sample_rate=h.sample_rate, hop_length=h.hop_length,
            win_length=h.win_length, n_fft=h.n_fft,
            n_mels=h.n_mels, f_min=h.f_min, f_max=h.f_max,
            power=1, normalized=False, norm="slaney",
            mel_scale="slaney", compression=True,
            )

    def compute_forward(self, params, state, batch, stage, rng):
        sig, lens = batch["sig"]
        mel = self.mel_fn(sig)
        noisy, noise, t = self.hparams.diffusion.train_sample(
            sig, rng if rng is not None else jax.random.PRNGKey(0)
        )
        pred, _ = self.module_apply(
            "model", params, state, noisy, t, mel, mutable_state=[],
        )
        return (pred, noise), state

    def compute_objectives(self, predictions, batch, stage):
        pred, noise = predictions
        return jnp.mean((pred - noise) ** 2)

    def init_forward(self, rng, eb):
        sig, _ = eb["sig"]
        mel = self.mel_fn(sig)
        t = jnp.zeros((sig.shape[0],), jnp.int32)
        p, s = self.init_module(rng, "model", sig, t, mel)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"loss": self.train_loss},
            valid_stats={"loss": stage_loss},
        )
        self.save_checkpoint(meta={"loss": stage_loss}, min_keys=["loss"])


def dataio_prepare(hparams):
    """Random fixed-length segments, mel-hop aligned."""
    seg = hparams["segment_size"]
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )

        def segment_pipeline(wav):
            sig = np.asarray(read_audio(wav))
            if len(sig) < seg:
                sig = np.pad(sig, (0, seg - len(sig)))
            start = int(rng.integers(0, max(len(sig) - seg, 1)))
            return sig[start : start + seg]

        ds.add_dynamic_item(segment_pipeline, takes="wav", provides="sig")
        ds.set_output_keys(["id", "sig"])
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
        sys.path.insert(0, str(Path(__file__).parents[3]))
        from ljspeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = DiffWaveBrain(
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
