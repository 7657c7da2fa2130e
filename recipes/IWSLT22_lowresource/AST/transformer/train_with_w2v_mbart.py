#!/usr/bin/env python
"""IWSLT22 low-resource AST with a wav2vec encoder and an mBART
decoder (the reference's recipes/IWSLT22_lowresource/AST/transformer/
train_with_w2v_mbart.py re-expressed for speechbrain_tpu): SSL speech
latents -> linear adapter into the mBART d_model -> the multilingual
decoder generates the translation; NLL on translation tokens. The
mBART branch trains under its own optimizer group at ``lr_mbart`` and
can be frozen (``mbart_frozen``, the reference's default low-resource
regime).

--debug provisions a tiny offline mBART config + char-level targets;
real runs point ``mbart_source`` at an HF snapshot.

Run: python train_with_w2v_mbart.py hparams/train_w2v_mbart.yaml \
    --data_folder=...
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class W2VmBARTAST(sb.Brain):
    """SSL extractor -> adapter -> mBART decoder."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        lat, _ = self.module_apply(
            "adapter", params, state, lat, mutable_state=[]
        )
        mbart = self.hparams.mbart
        mbart_params = params["mbart"]
        if self.hparams.mbart_frozen:
            mbart_params = jax.lax.stop_gradient(mbart_params)
        logits = mbart.model.decode(
            decoder_input_ids=jnp.asarray(tokens_bos, jnp.int32),
            encoder_outputs=(lat,),
            params=mbart_params,
        ).logits
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, p_seq, batch, stage):
        tokens_eos, tok_lens = batch["tokens_eos"]
        return nll_loss(p_seq, jnp.asarray(tokens_eos, jnp.int32),
                        length=tok_lens)

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        p_ext, _ = self.init_module(rng, "extractor", wavs)
        lat, _ = self.module_apply(
            "extractor", {"extractor": p_ext}, {}, wavs
        )
        p_ad, _ = self.init_module(rng, "adapter", lat)
        return {"params": {"extractor": p_ext, "adapter": p_ad,
                           "mbart": self.hparams.mbart.params}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            update_learning_rate(self.opt_state, new_lr, group="main")
            if not self.hparams.mbart_frozen:
                old_m, new_m = self.hparams.lr_annealing_mbart(stage_loss)
                update_learning_rate(
                    self.opt_state, new_m, group="mbart"
                )
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def make_optimizer(hparams):
    mbart_opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr_mbart"]
    )
    if hparams["mbart_frozen"]:
        mbart_opt = optax.set_to_zero()
    main = optax.inject_hyperparams(optax.adam)(
        learning_rate=hparams["lr"]
    )
    return optax.multi_transform(
        {"mbart": mbart_opt, "main": main},
        lambda params: {
            k: ("mbart" if k == "mbart" else "main") for k in params
        },
    )


def _char_tokens(text, bos, eos, vocab):
    ids = [4 + (ord(c) % (vocab - 5)) for c in text]
    return [bos, *ids], [*ids, eos]


def dataio_prepare(hparams):
    bos, eos = hparams["bos_index"], hparams["eos_index"]
    vocab = hparams["mbart_vocab"]
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def toks(translation):
            b, e = _char_tokens(translation, bos, eos, vocab)
            yield np.asarray(b, np.int32)
            yield np.asarray(e, np.int32)

        ds.add_dynamic_item(
            toks, takes="translation",
            provides=["tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(["id", "sig", "tokens_bos", "tokens_eos"])
        datasets[split] = ds
    return datasets


def _tiny_mbart_config(folder, vocab):
    """Offline debug stand-in for an HF mBART snapshot."""
    cfg = {
        "model_type": "mbart", "vocab_size": vocab,
        "d_model": 32, "encoder_layers": 1, "decoder_layers": 2,
        "encoder_attention_heads": 2, "decoder_attention_heads": 2,
        "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
        "max_position_embeddings": 128,
        "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 2,
        "decoder_start_token_id": 1, "forced_eos_token_id": 2,
    }
    d = Path(folder) / "tiny_mbart"
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
        sys.path.insert(
            0, str(Path(__file__).parents[2] / "ST" / "transformer")
        )
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    if hparams.get("mbart") is None:
        # decoder_type: nllb swaps in the NLLB wrapper (the reference's
        # train_*_nllb_st.yaml variants) — same seq2seq surface
        if hparams.get("decoder_type", "mbart") == "nllb":
            from speechbrain_tpu.integrations.huggingface.nllb import (
                NLLB as DecoderModel,
            )
        else:
            from speechbrain_tpu.integrations.huggingface.mbart import (
                mBART as DecoderModel,
            )

        if hparams["mbart_source"] == "debug-tiny":
            src = _tiny_mbart_config(
                hparams["data_folder"], hparams["mbart_vocab"]
            )
            hparams["mbart"] = DecoderModel(src, config_only=True)
        else:
            hparams["mbart"] = DecoderModel(
                hparams["mbart_source"], save_path=hparams["save_folder"],
                target_lang=hparams["target_lang"],
            )
    datasets = dataio_prepare(hparams)
    brain = W2VmBARTAST(
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
