#!/usr/bin/env python
"""RescueSpeech noise-robust ASR (the reference's
recipes/RescueSpeech/ASR/noise-robust/train.py re-expressed for
speechbrain_tpu): a spectral-mask enhancement front end cleans the
noisy magnitude spectrogram; a conformer CTC ASR trains on mel features
of the enhanced signal; losses = enhancement MSE (vs clean) + CTC."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.processing.signal_processing import resynthesize
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class RobustASR(sb.Brain):
    def spec_mag(self, wavs):
        return jnp.sqrt(self.hparams.compute_stft.power(wavs) + 1e-8)

    def compute_forward(self, params, state, batch, stage, rng):
        noisy, wav_lens = batch["noisy_sig"]
        clean, _ = batch["clean_sig"]
        train = stage == sb.Stage.TRAIN
        noisy_mag = self.spec_mag(noisy)
        mask, _ = self.module_apply(
            "enhancer", params, state, noisy_mag, train=train,
            rngs={"dropout": rng} if train else None, mutable_state=[],
        )
        est_mag = noisy_mag * mask
        est_wav = resynthesize(
            est_mag, noisy, self.hparams.compute_stft,
            self.hparams.compute_istft,
        )
        feats = self.hparams.compute_features(est_wav)
        enc, _ = self.module_apply(
            "encoder", params, state, feats, wav_len=wav_lens,
            train=train, mutable_state=[], method="encode",
            rngs={"dropout": rng} if train else None,
        )
        logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        clean_mag = self.spec_mag(clean)
        return (
            jax.nn.log_softmax(logits, -1), est_mag, clean_mag,
        ), state

    def compute_objectives(self, pred, batch, stage):
        p_ctc, est_mag, clean_mag = pred
        _, wav_lens = batch["noisy_sig"]
        chars, char_lens = batch["char_encoded"]
        asr = ctc_loss(p_ctc, chars, wav_lens, char_lens,
                       blank_index=self.hparams.blank_index)
        enh = jnp.mean((est_mag - clean_mag) ** 2)
        return asr + self.hparams.enhance_weight * enh, {
            "asr": asr, "enh": enh,
        }

    def init_forward(self, rng, eb):
        noisy, wav_lens = eb["noisy_sig"]
        noisy_mag = self.spec_mag(noisy)
        p = {}
        p["enhancer"], _ = self.init_module(
            rng, "enhancer", noisy_mag, train=False
        )
        feats = self.hparams.compute_features(noisy)
        p["encoder"], _ = self.init_module(
            rng, "encoder", feats, method="encode"
        )
        enc, _ = self.module_apply(
            "encoder", {"encoder": p["encoder"]}, {}, feats,
            method="encode",
        )
        p["ctc_head"], _ = self.init_module(rng, "ctc_head", enc)
        return {"params": p}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def prepare_synthetic(data_folder, n_utts=8, sample_rate=16000, seed=0):
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    words = ["rescue", "help", "over"]
    manifests = {"train": {}, "valid": {}}
    for i in range(n_utts):
        idx = [(i + j) % len(words) for j in range(2)]
        clean = np.concatenate([
            np.sin(2 * np.pi * (250 + 80 * w)
                   * np.arange(4800) / sample_rate)
            for w in idx
        ]).astype(np.float32) * 0.5
        noisy = clean + 0.25 * rng.standard_normal(len(clean)).astype(
            np.float32
        )
        cp, npth = root / f"c{i}.wav", root / f"n{i}.wav"
        write_audio(str(cp), clean, sample_rate)
        write_audio(str(npth), noisy, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"u{i}"] = {
            "clean_wav": str(cp), "noisy_wav": str(npth),
            "words": " ".join(words[w] for w in idx),
            "length": len(clean) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def dataio_prepare(hparams):
    datasets = {}
    encoder = hparams["label_encoder"]
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="noisy_wav",
                            provides="noisy_sig")
        ds.add_dynamic_item(read_audio, takes="clean_wav",
                            provides="clean_sig")
        ds.add_dynamic_item(
            lambda words: list(words), takes="words", provides="char_list"
        )
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list",
        sequence_input=True,
        special_labels={"blank_label": hparams["blank_index"]},
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda cl: encoder.encode_sequence_array(cl),
            takes="char_list", provides="char_encoded",
        )
        ds.set_output_keys(
            ["id", "noisy_sig", "clean_sig", "char_encoded"]
        )
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
        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = RobustASR(
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
        train_loader_kwargs={
            "batch_size": hparams["batch_size"], "shuffle": True,
            "pad_to_multiple": {"noisy_sig": 2048, "clean_sig": 2048},
        },
        valid_loader_kwargs={
            "batch_size": hparams["batch_size"],
            "pad_to_multiple": {"noisy_sig": 2048, "clean_sig": 2048},
        },
    )
