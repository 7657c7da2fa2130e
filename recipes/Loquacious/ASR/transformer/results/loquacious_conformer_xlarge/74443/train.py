#!/usr/bin/env python
"""Loquacious Conformer CTC/attention training (the reference's
recipes/Loquacious/ASR/transformer/train.py, re-expressed for
speechbrain_tpu).

Joint CTC + label-smoothed attention objective over BPE targets; Noam
LR schedule; dynamic-length bucketed batches. Decode with the
transformer beam searcher + CTC joint scoring (see inference.ASR).

Run:
    python ../../librispeech_prepare.py $DATA manifests/
    python train.py hparams/conformer_small.yaml --data_folder=$DATA
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class ASR(sb.Brain):
    """Conv frontend -> Conformer encoder (+decoder) -> CTC & seq heads."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
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
        (enc, dec), _ = self.module_apply(
            "model", params, state, feats, tokens_bos, wav_len=wav_lens,
            train=train, mutable_state=[], rngs={"dropout": rng} if train else None,
        )
        ctc_logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        seq_logits, _ = self.module_apply(
            "seq_head", params, state, dec, mutable_state=[]
        )
        ns = self.merge_state(state, "frontend", u0)
        # include the RESCALED lengths for the CTC input-length calc
        return (
            jax.nn.log_softmax(ctc_logits, -1),
            jax.nn.log_softmax(seq_logits, -1),
            wav_lens,
        ), ns

    def compute_objectives(self, predictions, batch, stage):
        p_ctc, p_seq, enc_lens = predictions
        tokens, tok_lens = batch["tokens"]
        tokens_eos, tok_eos_lens = batch["tokens_eos"]
        w = self.hparams.ctc_weight
        loss_ctc = ctc_loss(
            p_ctc, tokens, enc_lens, tok_lens,
            blank_index=self.hparams.blank_index,
        )
        loss_seq = kldiv_loss(
            p_seq, tokens_eos, length=tok_eos_lens,
            label_smoothing=self.hparams.label_smoothing,
        )
        return w * loss_ctc + (1 - w) * loss_seq

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        feats = self.hparams.compute_features(wavs)
        p_f, s_f = self.init_module(rng, "frontend", feats, train=False)
        feats2, _ = self.module_apply(
            "frontend", {"frontend": p_f},
            {k: {"frontend": v} for k, v in s_f.items()}, feats, train=False,
        )
        p_m, _ = self.init_module(rng, "model", feats2, tokens_bos)
        (enc, dec), _ = self.module_apply(
            "model", {"model": p_m}, {}, feats2, tokens_bos
        )
        p_c, _ = self.init_module(rng, "ctc_head", enc)
        p_s, _ = self.init_module(rng, "seq_head", dec)
        out = {"params": {"frontend": p_f, "model": p_m, "ctc_head": p_c,
                          "seq_head": p_s}}
        for coll, tree in s_f.items():
            out[coll] = {"frontend": tree}
        return out

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        # Noam annealing happens after EVERY optimizer update (the
        # reference recipe steps noam_annealing in on_fit_batch_end);
        # stepping it once per epoch would leave the LR ~4 orders of
        # magnitude below lr_adam for the whole run.
        if should_step:
            old_lr, new_lr = self.hparams.noam_scheduler(None)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch, "lr": self.hparams.noam_scheduler.current_lr},
            train_stats={"loss": self.train_loss},
            valid_stats={"loss": stage_loss},
        )
        self.save_checkpoint(meta={"loss": stage_loss}, min_keys=["loss"])


def dataio_prepare(hparams, tokenizer):
    """Manifests -> datasets with audio + BPE token pipelines."""
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation"),
                       ("test", "test_annotation")):
        path = hparams[key]
        if not Path(path).exists():
            if split == "test":
                continue
            raise FileNotFoundError(
                f"{path} missing; run librispeech_prepare.py first"
            )
        ds = DynamicItemDataset.from_json(
            path, replacements={"data_root": hparams["data_folder"]}
        )
        if split == "train":
            ds = ds.filtered_sorted(sort_key="length")
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(words):
            import numpy as np

            ids = tokenizer.sp.encode_as_ids(words)
            yield np.asarray(ids, np.int32)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="words",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens", "tokens_bos", "tokens_eos"]
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
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adamw)(
            learning_rate=hparams["lr_adam"]
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
                             "shuffle": True, "pad_to_multiple": {"sig": 16000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 16000}},
    )
