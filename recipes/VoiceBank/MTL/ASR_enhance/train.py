#!/usr/bin/env python
"""VoiceBank MTL robust ASR (the reference's
recipes/Voicebank/MTL/ASR_enhance/train.py re-expressed for
speechbrain_tpu): a spectral-mask enhancement model and a CRDNN+CTC
perceptual/ASR model train jointly — enhancement L1 on clean magnitudes,
a MIMIC loss (L2 between the perceptual model's hidden features of
enhanced and clean audio, ref robust_asr.yaml), and CTC on the enhanced
signal's features."""

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


class MTLBrain(sb.Brain):
    def spec_mag(self, wavs):
        return jnp.sqrt(self.hparams.compute_stft.power(wavs) + 1e-8)

    def _perceive(self, params, state, wavs, wav_lens, train, rng):
        """Perceptual/ASR path: fbank -> CRDNN -> (features, CTC logits)."""
        feats = self.hparams.compute_features(wavs)
        hidden, u = self.module_apply(
            "asr_model", params, state, feats,
            train=train, mutable_state=["batch_stats"] if train else [],
            rngs={"dropout": rng} if train else None,
        )
        hidden = hidden[0] if isinstance(hidden, tuple) else hidden
        logits, _ = self.module_apply(
            "ctc_head", params, state, hidden, mutable_state=[]
        )
        return hidden, jax.nn.log_softmax(logits, -1), u

    def compute_forward(self, params, state, batch, stage, rng):
        noisy, wav_lens = batch["noisy_sig"]
        clean, _ = batch["clean_sig"]
        train = stage == sb.Stage.TRAIN
        if getattr(self.hparams, "perceptual_only", False):
            # pretrain_perceptual stage (ref hparams/pretrain_perceptual
            # .yaml): the perceptual ASR trains on CLEAN speech; the
            # enhancement path is bypassed entirely
            clean_mag = self.spec_mag(clean)
            hidden, p_ctc, u = self._perceive(
                params, state, clean, wav_lens, train, rng
            )
            ns = self.merge_state(state, "asr_model", u)
            return (
                clean_mag, clean_mag, hidden,
                jax.lax.stop_gradient(hidden), p_ctc,
            ), ns
        noisy_mag = self.spec_mag(noisy)
        mask, _ = self.module_apply(
            "enhance_model", params, state, noisy_mag, train=train,
            rngs={"dropout": rng} if train else None, mutable_state=[],
        )
        est_mag = noisy_mag * mask
        est_wav = resynthesize(
            est_mag, noisy, self.hparams.compute_stft,
            self.hparams.compute_istft,
        )
        est_hidden, p_ctc, u = self._perceive(
            params, state, est_wav, wav_lens, train, rng
        )
        # clean-path features for the mimic loss: frozen target
        clean_hidden, _, _ = self._perceive(
            params, state, clean, wav_lens, False, rng
        )
        clean_hidden = jax.lax.stop_gradient(clean_hidden)
        ns = self.merge_state(state, "asr_model", u)
        return (
            est_mag, self.spec_mag(clean), est_hidden, clean_hidden, p_ctc,
        ), ns

    def compute_objectives(self, pred, batch, stage):
        est_mag, clean_mag, est_hidden, clean_hidden, p_ctc = pred
        _, wav_lens = batch["noisy_sig"]
        chars, char_lens = batch["char_encoded"]
        enhance = jnp.mean(jnp.abs(est_mag - clean_mag))
        mimic = jnp.mean((est_hidden - clean_hidden) ** 2)
        asr = ctc_loss(p_ctc, chars, wav_lens, char_lens,
                       blank_index=self.hparams.blank_index)
        loss = (
            self.hparams.enhance_weight * enhance
            + self.hparams.mimic_weight * mimic
            + self.hparams.ctc_weight * asr
        )
        return loss, {"enhance": enhance, "mimic": mimic, "ctc": asr}

    def init_forward(self, rng, eb):
        noisy, wav_lens = eb["noisy_sig"]
        noisy_mag = self.spec_mag(noisy)
        p = {}
        p["enhance_model"], _ = self.init_module(
            rng, "enhance_model", noisy_mag, train=False
        )
        feats = self.hparams.compute_features(noisy)
        p["asr_model"], s_a = self.init_module(
            rng, "asr_model", feats, train=False
        )
        hidden, _ = self.module_apply(
            "asr_model", {"asr_model": p["asr_model"]},
            {k: {"asr_model": v} for k, v in s_a.items()}, feats,
            train=False,
        )
        hidden = hidden[0] if isinstance(hidden, tuple) else hidden
        p["ctc_head"], _ = self.init_module(rng, "ctc_head", hidden)
        out = {"params": p}
        for coll, tree in s_a.items():
            out[coll] = {"asr_model": tree}
        return out

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
    words = ["clean", "speech", "now"]
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
    brain = MTLBrain(
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
