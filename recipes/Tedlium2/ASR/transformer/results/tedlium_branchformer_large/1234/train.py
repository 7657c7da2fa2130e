#!/usr/bin/env python
"""Tedlium-2 character CTC ASR over a conformer encoder (the
reference's recipes/Tedlium2/ASR/transformer/train.py re-expressed
for speechbrain_tpu; published WER 8.11 test, PERFORMANCE.md)."""

import sys
from pathlib import Path

import jax
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class ASRCTC(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        feats, u0 = self.module_apply(
            "frontend", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        # lane-align the encoder sequence length (TPU tiling: measured
        # 15% encoder speedup at T=251->256 on v5e); relative lengths
        # are rescaled so masks and CTC input lengths stay exact
        from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

        feats, wav_lens = pad_time_to_multiple(feats, wav_lens, multiple=128)
        enc, _ = self.module_apply(
            "encoder", params, state, feats, wav_len=wav_lens, train=train,
            mutable_state=[], method="encode",
            rngs={"dropout": rng} if train else None,
        )
        logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        ns = self.merge_state(state, "frontend", u0)
        # return the RESCALED lengths: the pre-padding relative lens
        # applied to the padded frame axis would inflate CTC input
        # lengths by T_padded/T_true
        return (jax.nn.log_softmax(logits, -1), wav_lens), ns

    def compute_objectives(self, predictions, batch, stage):
        p_ctc, enc_lens = predictions
        tokens, tok_lens = batch["tokens"]
        return ctc_loss(
            p_ctc, tokens, enc_lens, tok_lens,
            blank_index=self.hparams.blank_index,
        )

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        feats = self.hparams.compute_features(wavs)
        p_f, s_f = self.init_module(rng, "frontend", feats, train=False)
        feats2, _ = self.module_apply(
            "frontend", {"frontend": p_f},
            {k: {"frontend": v} for k, v in s_f.items()}, feats, train=False,
        )
        p_e, _ = self.init_module(rng, "encoder", feats2, None)
        enc, _ = self.module_apply(
            "encoder", {"encoder": p_e}, {}, feats2, method="encode"
        )
        p_c, _ = self.init_module(rng, "ctc_head", enc)
        out = {"params": {"frontend": p_f, "encoder": p_e, "ctc_head": p_c}}
        for coll, tree in s_f.items():
            out[coll] = {"frontend": tree}
        return out

    def transcribe_batch(self, batch):
        """Greedy CTC transcription of a prepared batch (eval helper)."""
        (logp, enc_lens), _ = self.compute_forward(
            self.params, self.model_state, batch, sb.Stage.TEST, self.rng
        )
        return ctc_greedy_decode(
            logp, enc_lens, blank_id=self.hparams.blank_index
        )

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
    datasets = {}
    encoder = CTCTextEncoder()
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda w: list(w), takes="words", provides="char_list"
        )
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/char_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list",
        sequence_input=True,
        special_labels={"blank_label": "<blank>"},
    )
    hparams["blank_index"] = encoder.get_blank_index()
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda cl: np.asarray(
                [int(i) for i in encoder.encode_sequence(cl)], np.int32
            ),
            takes="char_list", provides="tokens",
        )
        ds.set_output_keys(["id", "sig", "tokens"])
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
        sys.path.insert(0, str(Path(__file__).parent))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = ASRCTC(
        modules=hparams["modules"],
        opt_class=lambda: optax.adamw(hparams["lr"]),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    brain.fit(
        hparams["epoch_counter"],
        datasets["train"],
        datasets["valid"],
        train_loader_kwargs={"batch_size": hparams["batch_size"],
                             "shuffle": True,
                             "pad_to_multiple": {"sig": 4800}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 4800}},
    )
