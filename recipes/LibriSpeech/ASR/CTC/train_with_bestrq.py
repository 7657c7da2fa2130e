#!/usr/bin/env python
"""LibriSpeech character CTC fine-tuning a BEST-RQ pretrained conformer
(the reference's recipes/LibriSpeech/ASR/CTC/train_with_bestrq.py
re-expressed for speechbrain_tpu): the fbank -> conv frontend ->
conformer encoder stack from the BEST-RQ pretraining recipe
(../..self-supervised-learning/BEST-RQ) gets a CTC head; pretrained
weights are recovered through the Checkpointer/Pretrainer when
``pretrained_folder`` is set, otherwise the stack trains from scratch.
The encoder fine-tunes under its own optimizer group at ``lr_encoder``.

Run: python train_with_bestrq.py hparams/train_with_bestrq.yaml \
    --data_folder=...
"""

import sys
from pathlib import Path

import jax
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

ENCODER_MODULES = ("frontend", "encoder")


class BestRQCTC(sb.Brain):
    """Pretrained fbank->conv->conformer encoder + linear CTC head."""

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
        enc, _ = self.module_apply(
            "encoder", params, state, feats, wav_len=wav_lens, train=train,
            mutable_state=[], method="encode",
            rngs={"dropout": rng} if train else None,
        )
        logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        ns = self.merge_state(state, "frontend", u0)
        return jax.nn.log_softmax(logits, -1), ns

    def compute_objectives(self, p_ctc, batch, stage):
        wavs, wav_lens = batch["sig"]
        tokens, tok_lens = batch["tokens"]
        loss = ctc_loss(
            p_ctc, tokens, wav_lens, tok_lens,
            blank_index=self.hparams.blank_index,
        )
        return loss

    def transcribe_batch(self, batch):
        """Greedy CTC transcription of a prepared batch (eval
        helper, runs OUTSIDE jit)."""
        logp, _ = self.compute_forward(
            self.params, self.model_state, batch, sb.Stage.TEST,
            self.rng,
        )
        wavs, wav_lens = batch["sig"]
        return ctc_greedy_decode(
            logp, wav_lens, blank_id=self.hparams.blank_index
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
        p_h, _ = self.init_module(rng, "ctc_head", enc)
        out = {"params": {"frontend": p_f, "encoder": p_e,
                          "ctc_head": p_h}}
        for coll, tree in s_f.items():
            out[coll] = {"frontend": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            old_lr_e, new_lr_e = self.hparams.lr_annealing_encoder(
                stage_loss
            )
            update_learning_rate(self.opt_state, new_lr, group="main")
            update_learning_rate(self.opt_state, new_lr_e, group="encoder")
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr,
                            "lr_encoder": old_lr_e},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def make_optimizer(hparams):
    enc = optax.inject_hyperparams(optax.adamw)(
        learning_rate=hparams["lr_encoder"]
    )
    main = optax.inject_hyperparams(optax.adamw)(
        learning_rate=hparams["lr"]
    )
    return optax.multi_transform(
        {"encoder": enc, "main": main},
        lambda params: {
            k: ("encoder" if k in ENCODER_MODULES else "main")
            for k in params
        },
    )


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
        path=f"{hparams['save_folder']}/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list",
        sequence_input=True,
        special_labels={"blank_label": "<blank>"},
    )
    hparams["blank_index"] = encoder.get_blank_index()
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda cl: encoder.encode_sequence_array(cl),
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
    if run_opts.get("debug") and not Path(
        hparams["train_annotation"]
    ).exists():
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    brain = BestRQCTC(
        modules=hparams["modules"],
        opt_class=lambda: make_optimizer(hparams),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    if hparams.get("pretrained_folder"):
        # recover the BEST-RQ pretraining's frontend+encoder weights
        from speechbrain_tpu.utils.parameter_transfer import Pretrainer

        Pretrainer(
            collect_in=hparams["save_folder"],
            loadables={"frontend": hparams["frontend"],
                       "encoder": hparams["encoder"]},
            paths={
                "frontend": f"{hparams['pretrained_folder']}/frontend.ckpt",
                "encoder": f"{hparams['pretrained_folder']}/encoder.ckpt",
            },
        ).collect_files()
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
