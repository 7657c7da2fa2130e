#!/usr/bin/env python
"""End-to-end speech-LLM ASR training (the reference's
recipes/LibriSpeech/ASR/transformer/train_speechllm.py re-expressed
for speechbrain_tpu): audio -> speech encoder -> frame downsampler ->
projection into the LLM embedding space; the projected audio prefix is
concatenated with the transcript token embeddings and the CAUSAL LM
scores the whole stream — NLL on the transcript positions trains the
projector (and optionally the encoder/LLM). The trained stack serves
through inference.ASR.SpeechLLMASR.

The reference backs this with a LoRA-adapted HF LLaMA; the debug-
runnable native backbone is TransformerLM via its ``forward_embeds``
multimodal hook (pour a torch LLM through utils/torch_convert for real
runs). The LLM trains under its own optimizer group at ``lr_llm``
(set ``freeze_llm`` to train the projector alone, the reference's
default warm-up regime).

Run: python train_speechllm.py hparams/speechllm.yaml --data_folder=...
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


class SpeechLLMBrain(sb.Brain):
    """Encoder -> downsample -> proj -> causal LM over the joint
    audio+text embedding stream."""

    def compute_forward(self, params, state, batch, stage, rng):
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        if self.hparams.freeze_llm:
            params = {
                **params, "llm": jax.lax.stop_gradient(params["llm"]),
            }
        if getattr(self.hparams, "use_feats", False):
            # pre-extracted SSL features (hparams/speechllm_ssl_feats:
            # extract_ssl_feats.py cache replaces the live speech
            # encoder, ref train_speechllm.py:135-147)
            if "feats" not in batch:
                raise ValueError(
                    "use_feats=True but the batch provides no 'feats'; "
                    "check feats_cache_dir and the data pipeline."
                )
            enc, _ = batch["feats"]
        else:
            wavs, wav_lens = batch["sig"]
            feats = self.hparams.compute_features(wavs)
            feats = self.hparams.normalize(feats, wav_lens)
            feats, _ = self.module_apply(
                "enc_proj", params, state, feats, mutable_state=[]
            )
            enc, _ = self.module_apply(
                "speech_encoder", params, state, feats, train=train,
                mutable_state=[],
                rngs={"dropout": rng} if train else None,
            )
            enc = enc[0] if isinstance(enc, tuple) else enc
        # frame-rate reduction before the LLM (reference downsampler)
        k = self.hparams.downsample_factor
        enc = enc[:, ::k]
        audio_embds, _ = self.module_apply(
            "proj", params, state, enc, mutable_state=[]
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
        # logits at the token positions predict the NEXT token: the
        # slice starting at the last audio frame scores tokens_eos
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
        tokens_bos, _ = eb["tokens_bos"]
        if getattr(self.hparams, "use_feats", False):
            enc, _ = eb["feats"]
            params = {}
        else:
            wavs, wav_lens = eb["sig"]
            feats = self.hparams.compute_features(wavs)
            p_ep, _ = self.init_module(rng, "enc_proj", feats)
            feats, _ = self.module_apply(
                "enc_proj", {"enc_proj": p_ep}, {}, feats
            )
            p_enc, _ = self.init_module(rng, "speech_encoder", feats)
            enc, _ = self.module_apply(
                "speech_encoder", {"speech_encoder": p_enc}, {}, feats
            )
            enc = enc[0] if isinstance(enc, tuple) else enc
            params = {"enc_proj": p_ep, "speech_encoder": p_enc}
        enc = enc[:, :: self.hparams.downsample_factor]
        p_proj, _ = self.init_module(rng, "proj", enc)
        p_llm, _ = self.init_module(rng, "llm", tokens_bos)
        return {"params": {**params, "proj": p_proj, "llm": p_llm}}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            old_lr_llm, new_lr_llm = self.hparams.lr_annealing_llm(
                stage_loss
            )
            update_learning_rate(self.opt_state, new_lr, group="main")
            if not self.hparams.freeze_llm:
                update_learning_rate(
                    self.opt_state, new_lr_llm, group="llm"
                )
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr,
                            "lr_llm": old_lr_llm},
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
    use_feats = bool(hparams.get("use_feats", False))
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        if use_feats:
            # pre-extracted SSL features from extract_ssl_feats.py's
            # cache (pickle backend: one <id>.pkl per utterance)
            import pickle

            cache_dir = Path(hparams["feats_cache_dir"])

            def load_feats(uid):
                with open(cache_dir / f"{uid}.pkl", "rb") as fo:
                    return np.asarray(pickle.load(fo), np.float32)

            ds.add_dynamic_item(load_feats, takes="id", provides="feats")
        else:
            ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(words):
            ids = tokenizer.sp.encode_as_ids(words)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="words",
            provides=["tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "feats" if use_feats else "sig",
             "tokens_bos", "tokens_eos"]
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
    if run_opts.get("debug") and not Path(
        hparams["train_annotation"]
    ).exists():
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])  # writes train/dev/test.json
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_annotation"],
        annotation_read="words",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    if (
        run_opts.get("debug")
        and hparams.get("use_feats", False)
        and not Path(hparams["feats_cache_dir"]).exists()
    ):
        # debug smoke runs: stand in for extract_ssl_feats.py with a
        # quick fbank-features cache so the cached-feats plumbing
        # (pickle per id -> load_feats -> padded batches) is exercised
        # end to end without the SSL extraction pass
        import pickle

        cache = Path(hparams["feats_cache_dir"])
        cache.mkdir(parents=True, exist_ok=True)
        for key in ("train_annotation", "valid_annotation"):
            ds = DynamicItemDataset.from_json(
                hparams[key],
                replacements={"data_root": hparams["data_folder"]},
            )
            ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
            ds.set_output_keys(["id", "sig"])
            for item in ds:
                feats = hparams["compute_features"](
                    jnp.asarray(item["sig"])[None]
                )[0]
                with open(cache / f"{item['id']}.pkl", "wb") as fo:
                    pickle.dump(np.asarray(feats), fo)
    datasets = dataio_prepare(hparams, tokenizer)
    brain = SpeechLLMBrain(
        modules=hparams["modules"],
        opt_class=lambda: make_optimizer(hparams),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    pad = (
        {"feats": 32} if hparams.get("use_feats", False)
        else {"sig": 16000}
    )
    brain.fit(
        hparams["epoch_counter"],
        datasets["train"],
        datasets["valid"],
        train_loader_kwargs={"batch_size": hparams["batch_size"],
                             "shuffle": True, "pad_to_multiple": pad},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": pad},
    )
