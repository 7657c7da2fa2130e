#!/usr/bin/env python
"""VoxPopuli RNN-T ASR (the reference's recipes/VoxPopuli/ASR/transducer/
train.py re-expressed for speechbrain_tpu): conformer encoder + LSTM
prediction net + joint network with the native XLA transducer loss."""

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
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.nnet.transducer_loss import transducer_loss
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class TransducerASR(sb.Brain):
    """Conformer encoder + LSTM prediction net + additive joint."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens, _ = batch["tokens"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []

        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        feats, u0 = self.module_apply(
            "frontend", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        from speechbrain_tpu.utils.data_utils import pad_time_to_multiple

        feats, wav_lens = pad_time_to_multiple(feats, wav_lens, multiple=128)
        enc, _ = self.module_apply(
            "encoder", params, state, feats, wav_len=wav_lens, train=train,
            mutable_state=[], method="encode",
            rngs={"dropout": rng} if train else None,
        )
        enc_proj, _ = self.module_apply(
            "enc_proj", params, state, enc, mutable_state=[]
        )
        # prediction network over blank-prefixed targets
        blank = self.hparams.blank_index
        pn_in = jnp.concatenate(
            [jnp.full((tokens.shape[0], 1), blank, tokens.dtype), tokens],
            axis=1,
        )
        emb, _ = self.module_apply("emb", params, state, pn_in,
                                   mutable_state=[])
        pn, _ = self.module_apply("dec", params, state, emb,
                                  mutable_state=[])
        pn = pn[0] if isinstance(pn, tuple) else pn
        pn_proj, _ = self.module_apply(
            "dec_proj", params, state, pn, mutable_state=[]
        )
        joint, _ = self.module_apply(
            "joint", params, state, enc_proj[:, :, None, :],
            pn_proj[:, None, :, :], mutable_state=[],
        )
        logits, _ = self.module_apply("out", params, state, joint,
                                      mutable_state=[])
        ns = self.merge_state(state, "frontend", u0)
        outputs = [jax.nn.log_softmax(logits, -1), wav_lens]
        if self.hparams.ctc_weight > 0:
            ctc_logits, _ = self.module_apply(
                "ctc_head", params, state, enc_proj, mutable_state=[]
            )
            outputs.append(jax.nn.log_softmax(ctc_logits, -1))
        return tuple(outputs), ns

    def compute_objectives(self, predictions, batch, stage):
        logp, enc_lens, *rest = predictions
        tokens, tok_lens = batch["tokens"]
        loss = transducer_loss(
            logp, tokens, enc_lens, tok_lens, self.hparams.blank_index
        )
        if rest:
            loss_ctc = ctc_loss(
                rest[0], tokens, enc_lens, tok_lens,
                blank_index=self.hparams.blank_index,
            )
            w = self.hparams.ctc_weight
            loss = (1 - w) * loss + w * loss_ctc
        return loss

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tokens, _ = eb["tokens"]
        feats = self.hparams.compute_features(wavs)
        p = {}
        p["frontend"], s_f = self.init_module(rng, "frontend", feats,
                                              train=False)
        feats2, _ = self.module_apply(
            "frontend", {"frontend": p["frontend"]},
            {k: {"frontend": v} for k, v in s_f.items()}, feats, train=False,
        )
        p["encoder"], _ = self.init_module(
            rng, "encoder", feats2, method="encode"
        )
        enc, _ = self.module_apply(
            "encoder", {"encoder": p["encoder"]}, {}, feats2, method="encode"
        )
        p["enc_proj"], _ = self.init_module(rng, "enc_proj", enc)
        enc, _ = self.module_apply(
            "enc_proj", {"enc_proj": p["enc_proj"]}, {}, enc
        )
        blank = self.hparams.blank_index
        pn_in = jnp.concatenate(
            [jnp.full((tokens.shape[0], 1), blank, tokens.dtype), tokens],
            axis=1,
        )
        p["emb"], _ = self.init_module(rng, "emb", pn_in)
        emb, _ = self.module_apply("emb", {"emb": p["emb"]}, {}, pn_in)
        p["dec"], _ = self.init_module(rng, "dec", emb)
        pn, _ = self.module_apply("dec", {"dec": p["dec"]}, {}, emb)
        pn = pn[0] if isinstance(pn, tuple) else pn
        p["dec_proj"], _ = self.init_module(rng, "dec_proj", pn)
        pn, _ = self.module_apply(
            "dec_proj", {"dec_proj": p["dec_proj"]}, {}, pn
        )
        p["joint"], _ = self.init_module(
            rng, "joint", enc[:, :, None, :], pn[:, None, :, :]
        )
        joint, _ = self.module_apply(
            "joint", {"joint": p["joint"]}, {}, enc[:, :, None, :],
            pn[:, None, :, :],
        )
        p["out"], _ = self.init_module(rng, "out", joint)
        if self.hparams.ctc_weight > 0:
            p["ctc_head"], _ = self.init_module(rng, "ctc_head", enc)
        out = {"params": p}
        for coll, tree in s_f.items():
            out[coll] = {"frontend": tree}
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
        if split == "train":
            ds = ds.filtered_sorted(sort_key="length")
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda words: np.asarray(
                tokenizer.sp.encode_as_ids(words), np.int32
            ),
            takes="words", provides="tokens",
        )
        ds.set_output_keys(["id", "sig", "tokens"])
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
        sys.path.insert(0, str(Path(__file__).parents[1] / "CTC"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_annotation"],
        annotation_read="words",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = TransducerASR(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adamw)(
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
                             "pad_to_multiple": {"sig": 16000, "tokens": 16}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 16000, "tokens": 16}},
    )
