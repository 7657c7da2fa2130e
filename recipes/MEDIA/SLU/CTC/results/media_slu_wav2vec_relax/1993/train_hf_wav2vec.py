#!/usr/bin/env python
"""MEDIA SLU over a wav2vec2-style SSL encoder (the reference's
recipes/MEDIA/SLU/CTC/train_hf_wav2vec.py re-expressed for
speechbrain_tpu; published ChER 7.46): raw wave -> SSL latent
extractor -> attentional GRU decoder emitting concept/value semantic
tags as BPE tokens. The SSL branch trains under its own optimizer group at
``lr_wav2vec`` (the reference's model/wav2vec optimizer split).

Run: python train_hf_wav2vec.py hparams/train_hf_wav2vec.yaml \
    --data_folder=...
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
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.schedulers import update_learning_rate
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

SSL_MODULES = ("extractor",)


class W2VSLU(sb.Brain):
    """SSL extractor -> attentional GRU decoder over semantics tokens."""

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
        emb, _ = self.module_apply(
            "emb", params, state, tokens_bos, mutable_state=[]
        )
        dec_out, _ = self.module_apply(
            "dec", params, state, emb, lat, wav_lens, mutable_state=[]
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        logits, _ = self.module_apply(
            "seq_lin", params, state, dec_out, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, p_seq, batch, stage):
        tokens_eos, tok_lens = batch["tokens_eos"]
        return nll_loss(
            p_seq, tokens_eos, length=tok_lens,
            label_smoothing=self.hparams.label_smoothing,
        )

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
        p_emb, _ = self.init_module(rng, "emb", tokens_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tokens_bos)
        p_dec, _ = self.init_module(rng, "dec", emb, lat, wav_lens)
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, lat, wav_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_seq, _ = self.init_module(rng, "seq_lin", dec_out)
        return {"params": {
            "extractor": p_ext, "latent_proj": p_proj, "emb": p_emb,
            "dec": p_dec, "seq_lin": p_seq,
        }}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
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


def dataio_prepare(hparams, tokenizer):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(semantics):
            ids = tokenizer.sp.encode_as_ids(semantics)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="semantics",
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
        sys.path.insert(0, str(Path(__file__).parents[1]))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["output_neurons"],
        annotation_train=hparams["train_annotation"],
        annotation_read="semantics",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = W2VSLU(
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
