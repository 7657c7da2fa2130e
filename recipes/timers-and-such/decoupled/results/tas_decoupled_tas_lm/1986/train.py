#!/usr/bin/env python
"""timers-and-such DECOUPLED SLU: gold transcript text -> serialized
semantics (the reference's recipes/timers-and-such/decoupled/train.py
re-expressed for
speechbrain_tpu): transcript BPE tokens -> embedding -> LSTM encoder ->
attentional GRU decoder -> semantics-token NLL."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class NLU(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        transcript_tokens, transcript_lens = batch["transcript_tokens"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        te, _ = self.module_apply(
            "input_emb", params, state, transcript_tokens, mutable_state=[]
        )
        enc, _ = self.module_apply(
            "slu_enc", params, state, te, train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        enc = enc[0] if isinstance(enc, tuple) else enc
        emb, _ = self.module_apply(
            "output_emb", params, state, tokens_bos, mutable_state=[]
        )
        dec_out, _ = self.module_apply(
            "dec", params, state, emb, enc, transcript_lens,
            mutable_state=[],
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        logits, _ = self.module_apply(
            "seq_lin", params, state, dec_out, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, p_seq, batch, stage):
        tokens_eos, tok_lens = batch["tokens_eos"]
        return nll_loss(p_seq, tokens_eos, length=tok_lens,
                        label_smoothing=self.hparams.label_smoothing)

    def init_forward(self, rng, eb):
        transcript_tokens, transcript_lens = eb["transcript_tokens"]
        tokens_bos, _ = eb["tokens_bos"]
        p_ie, _ = self.init_module(rng, "input_emb", transcript_tokens)
        te, _ = self.module_apply(
            "input_emb", {"input_emb": p_ie}, {}, transcript_tokens
        )
        p_enc, _ = self.init_module(rng, "slu_enc", te)
        enc, _ = self.module_apply("slu_enc", {"slu_enc": p_enc}, {}, te)
        enc = enc[0] if isinstance(enc, tuple) else enc
        p_oe, _ = self.init_module(rng, "output_emb", tokens_bos)
        emb, _ = self.module_apply(
            "output_emb", {"output_emb": p_oe}, {}, tokens_bos
        )
        p_dec, _ = self.init_module(
            rng, "dec", emb, enc, transcript_lens
        )
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, enc, transcript_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_lin, _ = self.init_module(rng, "seq_lin", dec_out)
        return {"params": {"input_emb": p_ie, "slu_enc": p_enc,
                           "output_emb": p_oe, "dec": p_dec,
                           "seq_lin": p_lin}}

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

        def transcript_pipeline(transcript):
            return np.asarray(
                tokenizer.sp.encode_as_ids(transcript), np.int32
            )

        ds.add_dynamic_item(
            transcript_pipeline, takes="transcript",
            provides="transcript_tokens",
        )

        def semantics_pipeline(semantics):
            ids = tokenizer.sp.encode_as_ids(semantics)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            semantics_pipeline, takes="semantics",
            provides=["tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "transcript_tokens", "tokens_bos", "tokens_eos"]
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
    brain = NLU(
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
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
