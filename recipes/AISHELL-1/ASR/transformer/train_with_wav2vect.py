#!/usr/bin/env python
"""AISHELL-1 transformer ASR over a wav2vec2-style raw-wave SSL
encoder (the reference's recipes/AISHELL-1/ASR/transformer/
train_with_wav2vect.py re-expressed for speechbrain_tpu; published CER
5.58 test): the fbank+CNN frontend is replaced by the SSL latent
extractor, whose branch trains under its own optimizer group at
``lr_wav2vec`` (the reference's model/wav2vec optimizer split).

Run: python train_with_wav2vect.py hparams/train_with_wav2vect.yaml \
    --data_folder=...
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
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

SSL_MODULES = ("extractor",)


class W2VTransformerASR(sb.Brain):
    """SSL extractor -> TransformerASR -> CTC & seq heads."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        if self.hparams.freeze_wav2vec:
            params = {
                **params,
                "extractor": jax.lax.stop_gradient(params["extractor"]),
            }
        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        lat, _ = self.module_apply(
            "latent_proj", params, state, lat, mutable_state=[]
        )
        (enc, dec), _ = self.module_apply(
            "model", params, state, lat, tokens_bos, wav_len=wav_lens,
            train=train, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        ctc_logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        seq_logits, _ = self.module_apply(
            "seq_head", params, state, dec, mutable_state=[]
        )
        return (
            jax.nn.log_softmax(ctc_logits, -1),
            jax.nn.log_softmax(seq_logits, -1),
            wav_lens,
        ), state

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
        p_ext, _ = self.init_module(rng, "extractor", wavs)
        lat, _ = self.module_apply(
            "extractor", {"extractor": p_ext}, {}, wavs
        )
        p_proj, _ = self.init_module(rng, "latent_proj", lat)
        lat, _ = self.module_apply(
            "latent_proj", {"latent_proj": p_proj}, {}, lat
        )
        p_m, _ = self.init_module(rng, "model", lat, tokens_bos)
        (enc, dec), _ = self.module_apply(
            "model", {"model": p_m}, {}, lat, tokens_bos
        )
        p_c, _ = self.init_module(rng, "ctc_head", enc)
        p_s, _ = self.init_module(rng, "seq_head", dec)
        return {"params": {"extractor": p_ext, "latent_proj": p_proj,
                           "model": p_m, "ctc_head": p_c, "seq_head": p_s}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage != sb.Stage.VALID:
            return
        old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
        old_lr_ssl, new_lr_ssl = self.hparams.lr_annealing_wav2vec(
            stage_loss
        )
        update_learning_rate(self.opt_state, new_lr, group="main")
        if not self.hparams.freeze_wav2vec:
            update_learning_rate(self.opt_state, new_lr_ssl, group="wav2vec")
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch, "lr": old_lr,
                        "lr_wav2vec": old_lr_ssl},
            train_stats={"loss": self.train_loss},
            valid_stats={"loss": stage_loss},
        )
        self.save_checkpoint(meta={"loss": stage_loss}, min_keys=["loss"])


def make_optimizer(hparams):
    ssl = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr_wav2vec"]
    )
    if hparams["freeze_wav2vec"]:
        ssl = optax.set_to_zero()
    main = optax.inject_hyperparams(optax.adam)(learning_rate=hparams["lr"])
    return optax.multi_transform(
        {"wav2vec": ssl, "main": main},
        lambda params: {
            k: ("wav2vec" if k in SSL_MODULES else "main") for k in params
        },
    )


def dataio_prepare(hparams):
    """Same Mandarin character pipeline as the fbank transformer recipe
    (see ./train.py): charset from the training transcripts,
    <blank>/<bos>/<eos> reserved, indices written back into hparams."""
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
        sys.path.insert(0, str(Path(__file__).parent))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = W2VTransformerASR(
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
