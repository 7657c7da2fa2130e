#!/usr/bin/env python
"""CoVoST speech translation through a causal LLM (the reference's
recipes/CoVoST/AST/train_w2v2_llama.py re-expressed for
speechbrain_tpu): raw wave -> wav2vec latents -> frame downsampling ->
projection into the LLM embedding space; the audio prefix is
concatenated with the TRANSLATION token embeddings and the causal LM
scores the stream — NLL on the translation positions.

The reference adapts HF LLaMA with LoRA; the native debug-runnable
backbone is TransformerLM via its ``forward_embeds`` multimodal hook
(pour torch LLM weights through utils/torch_convert for real runs).
The LLM trains under its own optimizer group at ``lr_llm`` or is
frozen with ``freeze_llm``.

Run: python train_w2v2_llama.py hparams/train_w2v2_llama.yaml \
    --data_folder=...
"""

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
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

LLM_MODULES = ("llm",)


class W2V2LlamaAST(sb.Brain):
    """W2V extractor -> downsample -> proj -> causal LM over the
    joint audio+translation embedding stream."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        if self.hparams.freeze_llm:
            params = {
                **params, "llm": jax.lax.stop_gradient(params["llm"]),
            }
        lat, _ = self.module_apply(
            "extractor", params, state, wavs, mutable_state=[]
        )
        lat = lat[:, :: self.hparams.downsample_factor]
        audio_embds, _ = self.module_apply(
            "proj", params, state, lat, mutable_state=[]
        )
        tok_embds, _ = self.module_apply(
            "llm", params, state, tokens_bos, mutable_state=[],
            method="embed_tokens",
        )
        stream = jnp.concatenate([audio_embds, tok_embds], axis=1)
        logits, _ = self.module_apply(
            "llm", params, state, stream, train=train, mutable_state=[],
            method="forward_embeds",
            rngs={"dropout": rng} if train else None,
        )
        T_audio = audio_embds.shape[1]
        U = tok_embds.shape[1]
        text_logits = jax.lax.dynamic_slice_in_dim(
            logits, T_audio - 1, U, axis=1
        )
        return jax.nn.log_softmax(text_logits, -1), state

    def compute_objectives(self, p_text, batch, stage):
        tokens_eos, tok_lens = batch["tokens_eos"]
        return nll_loss(p_text, tokens_eos, length=tok_lens)

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        p_ext, _ = self.init_module(rng, "extractor", wavs)
        lat, _ = self.module_apply(
            "extractor", {"extractor": p_ext}, {}, wavs
        )
        lat = lat[:, :: self.hparams.downsample_factor]
        p_proj, _ = self.init_module(rng, "proj", lat)
        p_llm, _ = self.init_module(rng, "llm", tokens_bos)
        return {"params": {"extractor": p_ext, "proj": p_proj,
                           "llm": p_llm}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            update_learning_rate(self.opt_state, new_lr, group="main")
            if not self.hparams.freeze_llm:
                old_l, new_l = self.hparams.lr_annealing_llm(stage_loss)
                update_learning_rate(self.opt_state, new_l, group="llm")
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def make_optimizer(hparams):
    llm_opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=hparams["lr_llm"]
    )
    if hparams["freeze_llm"]:
        llm_opt = optax.set_to_zero()
    main = optax.inject_hyperparams(optax.adamw)(
        learning_rate=hparams["lr"]
    )
    return optax.multi_transform(
        {"llm": llm_opt, "main": main},
        lambda params: {
            k: ("llm" if k in LLM_MODULES else "main") for k in params
        },
    )


def dataio_prepare(hparams, tokenizer):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(translation):
            ids = tokenizer.sp.encode_as_ids(translation)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="translation",
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
    if run_opts.get("debug") and not Path(
        hparams["train_annotation"]
    ).exists():
        sys.path.insert(0, str(Path(__file__).parents[1] / "ST" /
                               "transformer"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_annotation"],
        annotation_read="translation",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = W2V2LlamaAST(
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
