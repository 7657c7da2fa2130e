#!/usr/bin/env python
"""Timers and Such "direct" SLU (the reference's recipes/timers-and-such/direct/train_with_wav2vec2.py
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
    """CRDNN encoder -> attentional GRU decoder over semantics tokens."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        lat, _ = self.module_apply(
            "wav2vec2", params, state, wavs, mutable_state=[]
        )
        enc, u1 = self.module_apply(
            "enc", params, state, lat, mutable_state=[]
        )
        emb, _ = self.module_apply(
            "emb", params, state, tokens_bos, mutable_state=[]
        )
        dec_out, _ = self.module_apply(
            "dec", params, state, emb, enc, wav_lens, mutable_state=[]
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        logits, _ = self.module_apply(
            "seq_lin", params, state, dec_out, mutable_state=[]
        )
        ns = self.merge_state(state, "enc", u1)
        return jax.nn.log_softmax(logits, -1), ns

    def compute_objectives(self, predictions, batch, stage):
        tokens_eos, tok_lens = batch["tokens_eos"]
        return nll_loss(predictions, tokens_eos, length=tok_lens,
                        label_smoothing=self.hparams.label_smoothing)

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        p_w, _ = self.init_module(rng, "wav2vec2", wavs)
        lat, _ = self.module_apply("wav2vec2", {"wav2vec2": p_w}, {}, wavs)
        p_enc, s_enc = self.init_module(rng, "enc", lat)
        enc, _ = self.module_apply(
            "enc", {"enc": p_enc},
            {k: {"enc": v} for k, v in s_enc.items()}, lat,
        )
        p_emb, _ = self.init_module(rng, "emb", tokens_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tokens_bos)
        p_dec, _ = self.init_module(rng, "dec", emb, enc, wav_lens)
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, enc, wav_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_lin, _ = self.init_module(rng, "seq_lin", dec_out)
        out = {"params": {"wav2vec2": p_w, "enc": p_enc, "emb": p_emb,
                          "dec": p_dec, "seq_lin": p_lin}}
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
        ds.set_output_keys(["id", "sig", "tokens_bos", "tokens_eos"])
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
        sys.path.insert(0, str(Path(__file__).parent))
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
