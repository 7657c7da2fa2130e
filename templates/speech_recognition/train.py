#!/usr/bin/env python
"""Speech-recognition training template (the reference's
templates/speech_recognition/ASR, re-expressed for speechbrain_tpu):
Fbank -> Conformer -> CTC with character targets, greedy decode + WER.

Expects JSON manifests {utt: {"wav": path, "words": str, "length": s}}.
Run: ``python train.py train.yaml --data_folder=...``.
"""

import sys

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASRBrain(sb.Brain):
    """Fbank -> Conformer encoder -> CTC head."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, lens)
        enc, _ = self.module_apply(
            "encoder", params, state, feats, wav_len=lens,
            method="encode", mutable_state=[],
        )
        logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, predictions, batch, stage):
        wavs, wav_lens = batch["sig"]
        chars, char_lens = batch["char_encoded"]
        return ctc_loss(
            predictions, chars, wav_lens, char_lens,
            blank_index=self.hparams.blank_index,
        )

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p_enc, _ = self.init_module(
            rng, "encoder", feats, None
        )
        enc, _ = self.module_apply(
            "encoder", {"encoder": p_enc}, {}, feats, method="encode"
        )
        p_head, _ = self.init_module(rng, "ctc_head", enc)
        return {"params": {"encoder": p_enc, "ctc_head": p_head}}

    def on_stage_start(self, stage, epoch=None):
        if stage != sb.Stage.TRAIN:
            self.wer_metric = ErrorRateStats()

    def evaluate_batch_extra(self, predictions, batch):
        """Greedy-decode and accumulate WER (called from on_stage_end
        consumers; kept explicit for clarity)."""
        logp, _ = predictions
        wavs, wav_lens = batch["sig"]
        hyps = ctc_greedy_decode(
            logp, wav_lens, blank_id=self.hparams.blank_index
        )
        return hyps

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prep(hparams):
    """Manifests -> datasets with audio + char-encoding pipelines."""
    datasets = {}
    encoder = hparams["label_encoder"]
    for split, ann in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[ann],
            replacements={"data_root": hparams["data_folder"]},
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
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
        ds.set_output_keys(["id", "sig", "char_encoded"])
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
    datasets = dataio_prep(hparams)
    brain = ASRBrain(
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
                             "shuffle": True, "pad_to_multiple": {"sig": 4096}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 4096}},
    )
