#!/usr/bin/env python
"""FocalCodec stage 2 — waveform decoder training (the reference's
recipes/LibriTTS/focalcodec/train_decoder.py re-expressed for
speechbrain_tpu): the FROZEN stage-1 path (SSL encoder -> compressor
-> BSQ -> decompressor) produces reconstructed features; a HiFiGAN
generator is trained to synthesize the waveform from them with the
usual adversarial + feature-matching + mel losses (the reference's
Vocos decoder filled the same role). Recover the stage-1 weights with
``--quantizer_checkpoint=<stage-1 save dir>``.

Run: python train_decoder.py hparams/decoder.yaml --data_folder=...
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
from speechbrain_tpu.lobes.models.HifiGAN import (
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
    mel_loss,
    mel_spectogram,
)
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class DecoderBrain(sb.Brain):
    """Frozen codec path -> HiFiGAN generator; alternating D/G."""

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

    def codec_feats(self, params, seg):
        feats, _ = self.module_apply(
            "encoder", params, {}, seg, mutable_state=[]
        )
        lats, _ = self.module_apply(
            "compressor", params, {}, feats, mutable_state=[]
        )
        qout, _ = self.module_apply(
            "quantizer", params, {}, lats, mutable_state=[]
        )
        dec, _ = self.module_apply(
            "decompressor", params, {}, qout["quantized"], mutable_state=[]
        )
        return jax.lax.stop_gradient(dec)  # stage-1 path is frozen

    def generate(self, params, feats, n_samples):
        """Synthesize and pad/crop to exactly ``n_samples`` (the
        SSL hop times the frame count rarely matches the segment
        length sample-for-sample)."""
        wav, _ = self.module_apply(
            "generator", params, {}, feats, mutable_state=[]
        )
        if wav.shape[1] < n_samples:
            wav = jnp.pad(
                wav, ((0, 0), (0, n_samples - wav.shape[1]))
            )
        return wav[:, :n_samples]

    def d_loss_fn(self, params, state, batch, rng):
        seg = batch
        feats = self.codec_feats(params, seg)
        fake = jax.lax.stop_gradient(
            self.generate(params, feats, seg.shape[1])
        )
        s_fake, _ = self.module_apply(
            "discriminator", params, state, fake, mutable_state=[]
        )
        s_real, _ = self.module_apply(
            "discriminator", params, state, seg, mutable_state=[]
        )
        return discriminator_loss(s_fake[0], s_real[0]), state

    def g_loss_fn(self, params, state, batch, rng):
        seg = batch
        feats = self.codec_feats(params, seg)
        fake = self.generate(params, feats, seg.shape[1])
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
        sys.path.insert(0, str(Path(__file__).parents[1]))
        from libritts_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = DecoderBrain(
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
    k = jax.random.PRNGKey(hparams["seed"])
    p = {}
    p["encoder"], _ = brain.init_module(k, "encoder", seg)
    feats, _ = brain.module_apply(
        "encoder", {"encoder": p["encoder"]}, {}, seg
    )
    p["compressor"], _ = brain.init_module(k, "compressor", feats)
    lats, _ = brain.module_apply(
        "compressor", {"compressor": p["compressor"]}, {}, feats
    )
    p["quantizer"], _ = brain.init_module(k, "quantizer", lats)
    qout, _ = brain.module_apply(
        "quantizer", {"quantizer": p["quantizer"]}, {}, lats
    )
    p["decompressor"], _ = brain.init_module(
        k, "decompressor", qout["quantized"]
    )
    dec, _ = brain.module_apply(
        "decompressor", {"decompressor": p["decompressor"]}, {},
        qout["quantized"],
    )
    p["generator"], _ = brain.init_module(k, "generator", dec)
    p["discriminator"], _ = brain.init_module(k, "discriminator", seg)
    brain.params = p
    brain.model_state = {}
    if hparams.get("quantizer_checkpoint"):
        from speechbrain_tpu.utils.parameter_transfer import Pretrainer

        Pretrainer(
            collect_in=hparams["save_folder"],
            loadables={
                name: hparams[name]
                for name in ("encoder", "compressor", "quantizer",
                             "decompressor")
            },
            paths={
                name: f"{hparams['quantizer_checkpoint']}/{name}.ckpt"
                for name in ("encoder", "compressor", "quantizer",
                             "decompressor")
            },
        ).collect_files()
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
        valid_loader = brain.make_dataloader(
            datasets["valid"], sb.Stage.VALID, ckpt_prefix=None,
            batch_size=hparams["batch_size"],
        )
        mel_l1s = []
        for j, vbatch in enumerate(valid_loader):
            if run_opts.get("debug") and debug_batches and j >= debug_batches:
                break
            seg, _ = brain._prepare_batch(vbatch)["sig"]
            feats = brain.codec_feats(params, seg)
            fake = brain.generate(params, feats, seg.shape[1])
            mel_l1s.append(
                float(jnp.mean(jnp.abs(
                    brain.mel_fn(fake) - brain.mel_fn(seg)
                )))
            )
        valid_mel_l1 = sum(mel_l1s) / max(len(mel_l1s), 1)
        hparams["train_logger"].log_stats(
            stats_meta={"epoch": epoch},
            train_stats={
                "d_loss": sum(d_losses) / max(len(d_losses), 1),
                "g_loss": sum(g_losses) / max(len(g_losses), 1),
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
