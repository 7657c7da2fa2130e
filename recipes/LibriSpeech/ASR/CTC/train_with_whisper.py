#!/usr/bin/env python
"""LibriSpeech character CTC over the Whisper ENCODER (the reference's
recipes/LibriSpeech/ASR/CTC/train_with_whisper.py re-expressed for
speechbrain_tpu): the Whisper decoder is dropped entirely and a linear
CTC head is trained on the encoder states — the "whisper as a feature
encoder" recipe. The encoder fine-tunes under its own optimizer group
at ``lr_whisper`` and can be frozen with ``freeze_whisper``.

In ``--debug`` a tiny random offline Whisper config is provisioned;
real runs point ``whisper_source`` at an HF snapshot.

Run: python train_with_whisper.py hparams/train_with_whisper.yaml \
    --data_folder=...
"""

import json
import sys
from pathlib import Path

import jax
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class WhisperCTC(sb.Brain):
    """Whisper encoder -> linear CTC head over characters."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        whisper = self.hparams.whisper
        mel = whisper._log_mel(wavs)
        enc = whisper.model.encode(
            input_features=mel, params=params["whisper"]
        ).last_hidden_state
        if self.hparams.freeze_whisper:
            enc = jax.lax.stop_gradient(enc)
        logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, p_ctc, batch, stage):
        wavs, wav_lens = batch["sig"]
        tokens, tok_lens = batch["tokens"]
        # Whisper's mel frontend maps ALL inputs to its fixed 30 s
        # window, so every row uses the full encoder length
        import jax.numpy as jnp

        full = jnp.ones_like(wav_lens)
        return ctc_loss(
            p_ctc, tokens, full, tok_lens,
            blank_index=self.hparams.blank_index,
        )

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        whisper = self.hparams.whisper
        mel = whisper._log_mel(wavs)
        enc = whisper.model.encode(
            input_features=mel, params=whisper.params
        ).last_hidden_state
        p_head, _ = self.init_module(rng, "ctc_head", enc)
        return {"params": {"whisper": whisper.params,
                           "ctc_head": p_head}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            old_lr_w, new_lr_w = self.hparams.lr_annealing_whisper(
                stage_loss
            )
            update_learning_rate(self.opt_state, new_lr, group="main")
            if not self.hparams.freeze_whisper:
                update_learning_rate(
                    self.opt_state, new_lr_w, group="whisper"
                )
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr,
                            "lr_whisper": old_lr_w},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def make_optimizer(hparams):
    whisper_opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr_whisper"]
    )
    if hparams["freeze_whisper"]:
        whisper_opt = optax.set_to_zero()
    main = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr"]
    )
    return optax.multi_transform(
        {"whisper": whisper_opt, "main": main},
        lambda params: {
            k: ("whisper" if k == "whisper" else "main") for k in params
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


def _tiny_whisper_config(folder, vocab):
    """Offline debug stand-in for an HF Whisper snapshot."""
    cfg = {
        "model_type": "whisper", "vocab_size": vocab,
        "d_model": 32, "encoder_layers": 2, "decoder_layers": 2,
        "encoder_attention_heads": 2, "decoder_attention_heads": 2,
        "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
        "num_mel_bins": 80, "max_source_positions": 100,
        "max_target_positions": 100,
        "decoder_start_token_id": 1, "eos_token_id": 2,
        "pad_token_id": 0, "bos_token_id": 1,
    }
    d = Path(folder) / "tiny_whisper"
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(cfg))
    return str(d)


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
    if hparams.get("whisper") is None:
        from speechbrain_tpu.integrations.huggingface.whisper import (
            Whisper,
        )

        if hparams["whisper_source"] == "debug-tiny":
            src = _tiny_whisper_config(
                hparams["data_folder"], hparams["whisper_vocab"]
            )
            hparams["whisper"] = Whisper(src, config_only=True)
        else:
            hparams["whisper"] = Whisper(
                hparams["whisper_source"],
                save_path=hparams["save_folder"],
            )
    datasets = dataio_prepare(hparams)
    brain = WhisperCTC(
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
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
