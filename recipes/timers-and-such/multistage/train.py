#!/usr/bin/env python
"""Timers and Such "direct" SLU (the reference's recipes/timers-and-such/direct/train.py
re-expressed for speechbrain_tpu): speech -> serialized semantics
(intent + number slots dict string) with a CRDNN encoder + attention
GRU decoder over BPE semantics tokens.

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
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class SLU(sb.Brain):
    """ASR stage (speech -> transcript) + SLU stage (transcript ->
    semantics), jointly supervised."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        t_bos, _ = batch["transcript_bos"]
        t_tokens, t_lens = batch["transcript_tokens"]
        s_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        enc, u1 = self.module_apply(
            "enc", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        # ASR stage
        emb_t, _ = self.module_apply(
            "emb", params, state, t_bos, mutable_state=[]
        )
        dec_t, _ = self.module_apply(
            "dec", params, state, emb_t, enc, wav_lens, mutable_state=[]
        )
        dec_t = dec_t[0] if isinstance(dec_t, tuple) else dec_t
        asr_logits, _ = self.module_apply(
            "seq_lin", params, state, dec_t, mutable_state=[]
        )
        # SLU stage over the (gold during training) transcript tokens
        te, _ = self.module_apply(
            "slu_input_emb", params, state, t_tokens, mutable_state=[]
        )
        slu_enc, _ = self.module_apply(
            "slu_enc", params, state, te, train=train, mutable_state=[],
        )
        slu_enc = slu_enc[0] if isinstance(slu_enc, tuple) else slu_enc
        emb_s, _ = self.module_apply(
            "output_emb", params, state, s_bos, mutable_state=[]
        )
        dec_s, _ = self.module_apply(
            "slu_dec", params, state, emb_s, slu_enc, t_lens,
            mutable_state=[],
        )
        dec_s = dec_s[0] if isinstance(dec_s, tuple) else dec_s
        slu_logits, _ = self.module_apply(
            "slu_seq_lin", params, state, dec_s, mutable_state=[]
        )
        ns = self.merge_state(state, "enc", u1)
        return (
            jax.nn.log_softmax(asr_logits, -1),
            jax.nn.log_softmax(slu_logits, -1),
        ), ns

    def compute_objectives(self, predictions, batch, stage):
        p_asr, p_slu = predictions
        t_eos, t_eos_lens = batch["transcript_eos"]
        s_eos, s_eos_lens = batch["tokens_eos"]
        asr = nll_loss(p_asr, t_eos, length=t_eos_lens,
                       label_smoothing=self.hparams.label_smoothing)
        slu = nll_loss(p_slu, s_eos, length=s_eos_lens,
                       label_smoothing=self.hparams.label_smoothing)
        return asr + slu, {"asr": asr, "slu": slu}

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        t_bos, _ = eb["transcript_bos"]
        t_tokens, t_lens = eb["transcript_tokens"]
        s_bos, _ = eb["tokens_bos"]
        feats = self.hparams.compute_features(wavs)
        p = {}
        p["enc"], s_enc = self.init_module(rng, "enc", feats, train=False)
        enc, _ = self.module_apply(
            "enc", {"enc": p["enc"]},
            {k: {"enc": v} for k, v in s_enc.items()}, feats, train=False,
        )
        p["emb"], _ = self.init_module(rng, "emb", t_bos)
        emb_t, _ = self.module_apply("emb", {"emb": p["emb"]}, {}, t_bos)
        p["dec"], _ = self.init_module(rng, "dec", emb_t, enc, wav_lens)
        dec_t, _ = self.module_apply(
            "dec", {"dec": p["dec"]}, {}, emb_t, enc, wav_lens
        )
        dec_t = dec_t[0] if isinstance(dec_t, tuple) else dec_t
        p["seq_lin"], _ = self.init_module(rng, "seq_lin", dec_t)
        p["slu_input_emb"], _ = self.init_module(
            rng, "slu_input_emb", t_tokens
        )
        te, _ = self.module_apply(
            "slu_input_emb", {"slu_input_emb": p["slu_input_emb"]}, {},
            t_tokens,
        )
        p["slu_enc"], _ = self.init_module(rng, "slu_enc", te)
        slu_enc, _ = self.module_apply(
            "slu_enc", {"slu_enc": p["slu_enc"]}, {}, te
        )
        slu_enc = slu_enc[0] if isinstance(slu_enc, tuple) else slu_enc
        p["output_emb"], _ = self.init_module(rng, "output_emb", s_bos)
        emb_s, _ = self.module_apply(
            "output_emb", {"output_emb": p["output_emb"]}, {}, s_bos
        )
        p["slu_dec"], _ = self.init_module(
            rng, "slu_dec", emb_s, slu_enc, t_lens
        )
        dec_s, _ = self.module_apply(
            "slu_dec", {"slu_dec": p["slu_dec"]}, {}, emb_s, slu_enc,
            t_lens,
        )
        dec_s = dec_s[0] if isinstance(dec_s, tuple) else dec_s
        p["slu_seq_lin"], _ = self.init_module(rng, "slu_seq_lin", dec_s)
        out = {"params": p}
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


def dataio_prepare(hparams, tokenizer):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(semantics):
            ids = tokenizer.sp.encode_as_ids(semantics)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="semantics",
            provides=["tokens_bos", "tokens_eos"],
        )

        def transcript_pipeline(transcript):
            ids = tokenizer.sp.encode_as_ids(transcript)
            yield np.asarray(ids, np.int32)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            transcript_pipeline, takes="transcript",
            provides=["transcript_tokens", "transcript_bos",
                      "transcript_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens_bos", "tokens_eos",
             "transcript_tokens", "transcript_bos", "transcript_eos"]
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
        sys.path.insert(0, str(Path(__file__).parents[1] / "direct"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["output_neurons"],
        annotation_train=hparams["train_annotation"],
        annotation_read="semantics",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = SLU(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adam)(
            learning_rate=hparams["lr"]
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
                             "pad_to_multiple": {"sig": 4096}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 4096}},
    )
