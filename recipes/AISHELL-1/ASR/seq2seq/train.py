#!/usr/bin/env python
"""AISHELL-1 attention-based seq2seq ASR (the reference's
recipes/AISHELL-1/ASR/seq2seq/train.py re-expressed for
speechbrain_tpu): CRDNN encoder + attentional GRU decoder over Mandarin
characters, joint CTC/attention training; published CER 7.51 dev.

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
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class ASR(sb.Brain):
    """CRDNN encoder -> attentional GRU decoder -> CTC & seq heads."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        enc, u1 = self.module_apply(
            "enc", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        emb, _ = self.module_apply(
            "emb", params, state, tokens_bos, mutable_state=[]
        )
        dec_out, _ = self.module_apply(
            "dec", params, state, emb, enc, wav_lens, mutable_state=[]
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        seq_logits, _ = self.module_apply(
            "seq_lin", params, state, dec_out, mutable_state=[]
        )
        ctc_logits, _ = self.module_apply(
            "ctc_lin", params, state, enc, mutable_state=[]
        )
        ns = self.merge_state(state, "enc", u1)
        return (
            jax.nn.log_softmax(ctc_logits, -1),
            jax.nn.log_softmax(seq_logits, -1),
        ), ns

    def compute_objectives(self, predictions, batch, stage):
        p_ctc, p_seq = predictions
        wavs, wav_lens = batch["sig"]
        tokens, tok_lens = batch["tokens"]
        tokens_eos, tok_eos_lens = batch["tokens_eos"]
        w = self.hparams.ctc_weight
        loss_ctc = ctc_loss(
            p_ctc, tokens, wav_lens, tok_lens,
            blank_index=self.hparams.blank_index,
        )
        loss_seq = nll_loss(
            p_seq, tokens_eos, length=tok_eos_lens,
            label_smoothing=self.hparams.label_smoothing,
        )
        return w * loss_ctc + (1 - w) * loss_seq

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        feats = self.hparams.compute_features(wavs)
        p_enc, s_enc = self.init_module(rng, "enc", feats, train=False)
        enc, _ = self.module_apply(
            "enc", {"enc": p_enc},
            {k: {"enc": v} for k, v in s_enc.items()}, feats, train=False,
        )
        p_emb, _ = self.init_module(rng, "emb", tokens_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tokens_bos)
        p_dec, _ = self.init_module(rng, "dec", emb, enc, wav_lens)
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, enc, wav_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_seq, _ = self.init_module(rng, "seq_lin", dec_out)
        p_ctc, _ = self.init_module(rng, "ctc_lin", enc)
        out = {"params": {"enc": p_enc, "emb": p_emb, "dec": p_dec,
                          "seq_lin": p_seq, "ctc_lin": p_ctc}}
        for coll, tree in s_enc.items():
            out[coll] = {"enc": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prepare(hparams):
    """AISHELL manifests -> datasets with the Mandarin character
    inventory built from the training transcripts (<blank>/<bos>/<eos>
    reserved); resolved indices are written back into hparams."""
    datasets = {}
    encoder = CTCTextEncoder()
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda t: list(t), takes="transcript", provides="char_list"
        )
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/char_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list",
        sequence_input=True,
        special_labels={
            "blank_label": "<blank>",
            "bos_label": "<bos>",
            "eos_label": "<eos>",
        },
    )
    hparams["blank_index"] = encoder.get_blank_index()
    bos, eos = encoder.get_bos_index(), encoder.get_eos_index()
    for ds in datasets.values():
        def tokens_pipeline(char_list):
            ids = [int(i) for i in encoder.encode_sequence(char_list)]
            yield np.asarray(ids, np.int32)
            yield np.asarray([bos] + ids, np.int32)
            yield np.asarray(ids + [eos], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="char_list",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(["id", "sig", "tokens", "tokens_bos",
                            "tokens_eos"])
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
        sys.path.insert(0, str(Path(__file__).parents[1] / "transformer"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adadelta)(
            learning_rate=hparams["lr"], rho=0.95, eps=1e-8
        ),
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
                             "pad_to_multiple": {"sig": 16000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 16000}},
    )
