#!/usr/bin/env python
"""CommonVoice attention-based seq2seq ASR over a wav2vec2-style SSL
encoder (the reference's recipes/CommonVoice/ASR/seq2seq/
train_with_wav2vec.py re-expressed for speechbrain_tpu): raw-wave
latent extractor + attentional GRU decoder over BPE targets, joint
CTC/attention training with the reference's two-optimizer split (the
SSL branch anneals at ``lr_wav2vec`` under its own group).

Run: python train_with_wav2vec.py hparams/train_with_wav2vec.yaml \
    --data_folder=$DATA
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import length_to_mask, read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

SSL_MODULES = ("extractor",)


class W2VSeq2Seq(sb.Brain):
    """SSL extractor -> attentional GRU decoder -> CTC & seq heads."""

    def _encode(self, params, state, wavs, wav_lens, train, rng):
        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        lat, _ = self.module_apply(
            "latent_proj", params, state, lat, mutable_state=[]
        )
        T = lat.shape[1]
        pad_mask = ~length_to_mask(
            jnp.round(wav_lens * T), max_len=T
        ).astype(bool)
        enc, _ = self.module_apply(
            "encoder", params, state, lat, src_key_padding_mask=pad_mask,
            train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        return enc[0] if isinstance(enc, tuple) else enc

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        if self.hparams.freeze_wav2vec:
            params = {
                **params,
                "extractor": jax.lax.stop_gradient(params["extractor"]),
            }
        enc = self._encode(params, state, wavs, wav_lens, train, rng)
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
        return (
            jax.nn.log_softmax(ctc_logits, -1),
            jax.nn.log_softmax(seq_logits, -1),
        ), state

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
        p_ext, _ = self.init_module(rng, "extractor", wavs)
        lat, _ = self.module_apply(
            "extractor", {"extractor": p_ext}, {}, wavs
        )
        p_proj, _ = self.init_module(rng, "latent_proj", lat)
        lat, _ = self.module_apply(
            "latent_proj", {"latent_proj": p_proj}, {}, lat
        )
        p_enc, _ = self.init_module(rng, "encoder", lat)
        enc, _ = self.module_apply("encoder", {"encoder": p_enc}, {}, lat)
        enc = enc[0] if isinstance(enc, tuple) else enc
        p_emb, _ = self.init_module(rng, "emb", tokens_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tokens_bos)
        p_dec, _ = self.init_module(rng, "dec", emb, enc, wav_lens)
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, enc, wav_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_seq, _ = self.init_module(rng, "seq_lin", dec_out)
        p_ctc, _ = self.init_module(rng, "ctc_lin", enc)
        return {"params": {
            "extractor": p_ext, "latent_proj": p_proj, "encoder": p_enc,
            "emb": p_emb, "dec": p_dec, "seq_lin": p_seq, "ctc_lin": p_ctc,
        }}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            from speechbrain_tpu.nnet.schedulers import update_learning_rate

            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            old_lr_ssl, new_lr_ssl = self.hparams.lr_annealing_wav2vec(
                stage_loss
            )
            update_learning_rate(self.opt_state, new_lr, group="main")
            if not self.hparams.freeze_wav2vec:
                update_learning_rate(
                    self.opt_state, new_lr_ssl, group="wav2vec"
                )
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr,
                            "lr_wav2vec": old_lr_ssl},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def make_optimizer(hparams):
    """Adadelta head + Adam SSL branch under one multi_transform
    (reference model_opt_class/wav2vec_opt_class)."""
    ssl = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr_wav2vec"]
    )
    if hparams["freeze_wav2vec"]:
        ssl = optax.set_to_zero()
    main = optax.inject_hyperparams(optax.adadelta)(
        learning_rate=hparams["lr"], rho=0.95, eps=1e-8
    )
    return optax.multi_transform(
        {"wav2vec": ssl, "main": main},
        lambda params: {
            k: ("wav2vec" if k in SSL_MODULES else "main") for k in params
        },
    )


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

        def tokens_pipeline(words):
            ids = tokenizer.sp.encode_as_ids(words)
            yield np.asarray(ids, np.int32)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="words",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "words", "tokens", "tokens_bos", "tokens_eos"]
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
        from commonvoice_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["output_neurons"],
        annotation_train=hparams["train_annotation"],
        annotation_read="words",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = W2VSeq2Seq(
        modules=hparams["modules"],
        opt_class=lambda: make_optimizer(hparams),
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
