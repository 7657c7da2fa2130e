#!/usr/bin/env python
"""IWSLT-22 low-resource (Tamasheq-French) audio speech translation, wav2vec-style SSL front end (the
reference's recipes/IWSLT22_lowresource/AST/transformer/train.py re-expressed for
speechbrain_tpu): SSL latents -> linear reduction -> causal transformer
decoder over the encoder memory (the reference's
forward_mt_decoder_only) -> translation NLL over BPE targets."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    get_lookahead_mask,
)
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class AST(sb.Brain):
    """SSL extractor -> enc proj -> MT decoder -> seq head."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        lat, _ = self.module_apply(
            "wav2vec2", params, state, wavs, mutable_state=[]
        )
        src, _ = self.module_apply("enc", params, state, lat,
                                   mutable_state=[])
        emb, _ = self.module_apply(
            "emb", params, state, tokens_bos, mutable_state=[]
        )
        emb = emb + self.hparams.positional_encoding.apply({}, emb)
        tgt_mask = get_lookahead_mask(emb.shape[1])
        out, _ = self.module_apply(
            "decoder", params, state, emb, src, tgt_mask=tgt_mask,
            train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        out = out[0] if isinstance(out, tuple) else out
        logits, _ = self.module_apply(
            "seq_lin", params, state, out, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, p_seq, batch, stage):
        tokens_eos, tok_lens = batch["tokens_eos"]
        return nll_loss(
            p_seq, tokens_eos, length=tok_lens,
            label_smoothing=self.hparams.label_smoothing,
        )

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        p_w, _ = self.init_module(rng, "wav2vec2", wavs)
        lat, _ = self.module_apply("wav2vec2", {"wav2vec2": p_w}, {}, wavs)
        p_e, _ = self.init_module(rng, "enc", lat)
        src, _ = self.module_apply("enc", {"enc": p_e}, {}, lat)
        p_emb, _ = self.init_module(rng, "emb", tokens_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tokens_bos)
        emb = emb + self.hparams.positional_encoding.apply({}, emb)
        p_d, _ = self.init_module(rng, "decoder", emb, src)
        out, _ = self.module_apply(
            "decoder", {"decoder": p_d}, {}, emb, src
        )
        out = out[0] if isinstance(out, tuple) else out
        p_l, _ = self.init_module(rng, "seq_lin", out)
        return {"params": {"wav2vec2": p_w, "enc": p_e, "emb": p_emb,
                           "decoder": p_d, "seq_lin": p_l}}

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
    bos, eos = hparams["bos_index"], hparams["eos_index"]
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def toks(translation):
            ids = tokenizer.sp.encode_as_ids(translation)
            yield np.asarray([bos, *ids], np.int32)
            yield np.asarray([*ids, eos], np.int32)

        ds.add_dynamic_item(
            toks, takes="translation",
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
        sys.path.insert(0, str(Path(__file__).parents[2] / "ST" /
                               "transformer"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_annotation"],
        annotation_read="translation",
        model_type="unigram",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = AST(
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
                             "shuffle": True, "pad_to_multiple": 2048},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": 2048},
    )
