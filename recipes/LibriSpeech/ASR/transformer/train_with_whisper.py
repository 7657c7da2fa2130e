#!/usr/bin/env python
"""Fine-tune Whisper on LibriSpeech with NLL over its own decoder (the
reference's recipes/LibriSpeech/ASR/transformer/train_with_whisper.py
re-expressed for speechbrain_tpu): Whisper log-mel -> (optionally
frozen) encoder -> decoder teacher-forced on bos-tokens -> label NLL.

In ``--debug`` the recipe self-provisions a tiny random Whisper config
(offline) and char-level targets; real runs point ``whisper_source`` at
an HF snapshot whose processor supplies the tokenizer."""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class WhisperASR(sb.Brain):
    def _whisper_params(self, params):
        """With ``use_lora``, the served weights are base + A@B deltas on
        the targeted attention kernels; only the deltas train (the
        reference's train_whisper_lora.yaml via nnet.adapters.LoRA,
        expressed functionally with apply_lora_tree + an optax mask)."""
        base = params["whisper"]
        if "lora" in params:
            from speechbrain_tpu.nnet.adapters import apply_lora_tree

            base = apply_lora_tree(
                jax.lax.stop_gradient(base), params["lora"],
                scale=getattr(self.hparams, "lora_scale", 1.0),
            )
        return base

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        whisper = self.hparams.whisper
        wparams = self._whisper_params(params)
        mel = whisper._log_mel(wavs)
        enc = whisper.model.encode(
            input_features=mel, params=wparams
        ).last_hidden_state
        if self.hparams.freeze_encoder:
            enc = jax.lax.stop_gradient(enc)
        logits = whisper.model.decode(
            decoder_input_ids=jnp.asarray(tokens_bos, jnp.int32),
            encoder_outputs=(enc,),
            params=wparams,
        ).logits
        return jax.nn.log_softmax(logits, axis=-1), state

    def compute_objectives(self, log_probs, batch, stage):
        tokens_eos, tokens_eos_lens = batch["tokens_eos"]
        return nll_loss(
            log_probs, jnp.asarray(tokens_eos, jnp.int32),
            length=jnp.asarray(tokens_eos_lens),
        )

    def init_forward(self, rng, eb):
        out = {"params": {"whisper": self.hparams.whisper.params}}
        if getattr(self.hparams, "use_lora", False):
            from speechbrain_tpu.nnet.adapters import init_lora_tree

            out["params"]["lora"] = init_lora_tree(
                out["params"]["whisper"],
                target_names=tuple(
                    getattr(self.hparams, "lora_targets",
                            ("q_proj", "v_proj"))
                ),
                rank=getattr(self.hparams, "lora_rank", 8),
            )
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def _char_tokens(words, bos, eos, vocab):
    ids = [3 + (ord(c) % (vocab - 4)) for c in words]
    return [bos, *ids], [*ids, eos]


def dataio_prepare(hparams):
    bos = hparams["bos_index"]
    eos = hparams["eos_index"]
    vocab = hparams["vocab_size"]
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def toks(words):
            import numpy as np

            b, e = _char_tokens(words, bos, eos, vocab)
            yield np.asarray(b, np.int32)
            yield np.asarray(e, np.int32)

        ds.add_dynamic_item(
            toks, takes="words", provides=["tokens_bos", "tokens_eos"]
        )
        ds.set_output_keys(["id", "sig", "tokens_bos", "tokens_eos"])
        datasets[split] = ds
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
    if run_opts.get("debug"):
        if not Path(hparams["train_annotation"]).exists():
            sys.path.insert(0, str(Path(__file__).parents[2]))
            from librispeech_prepare import prepare_synthetic

            prepare_synthetic(hparams["data_folder"])
    if hparams.get("whisper") is None:
        from speechbrain_tpu.integrations.huggingface.whisper import (
            Whisper,
        )

        if hparams["whisper_source"] == "debug-tiny":
            src = _tiny_whisper_config(
                hparams["data_folder"], hparams["vocab_size"]
            )
            hparams["whisper"] = Whisper(
                src, config_only=True,
                freeze_encoder=hparams["freeze_encoder"],
            )
        else:
            hparams["whisper"] = Whisper(
                hparams["whisper_source"],
                save_path=hparams["save_folder"],
                freeze_encoder=hparams["freeze_encoder"],
            )
    datasets = dataio_prepare(hparams)
    brain = WhisperASR(
        modules={},
        opt_class=(
            # LoRA: only the adapter deltas receive updates
            (lambda: optax.masked(
                optax.adamw(hparams["lr"]),
                lambda params: jax.tree_util.tree_map_with_path(
                    lambda path, _: any(
                        getattr(p, "key", None) == "lora" for p in path
                    ),
                    params,
                ),
            ))
            if hparams.get("use_lora")
            else (lambda: optax.adamw(hparams["lr"]))
        ),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    brain.fit(
        hparams["epoch_counter"],
        datasets["train"],
        datasets["valid"],
        # NOTE: no pad_to_multiple here — it would pad the TOKEN ids
        # past Whisper's max_target_positions (the mel path already
        # fixes the audio length to 30 s internally)
        train_loader_kwargs={"batch_size": hparams["batch_size"],
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
