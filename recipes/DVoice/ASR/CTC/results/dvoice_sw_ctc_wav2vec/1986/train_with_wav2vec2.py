#!/usr/bin/env python
"""DVoice (African languages) character CTC over a wav2vec2-style SSL
encoder (the reference's recipes/DVoice/ASR/CTC/train_with_wav2vec2.py
re-expressed for speechbrain_tpu)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import length_to_mask, read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class W2VCTC(sb.Brain):
    """W2V latent extractor -> transformer encoder -> char CTC."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
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
        enc = enc[0] if isinstance(enc, tuple) else enc
        logits, _ = self.module_apply(
            "ctc_head", params, state, enc, mutable_state=[]
        )
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, p_ctc, batch, stage):
        wavs, wav_lens = batch["sig"]
        chars, char_lens = batch["char_encoded"]
        return ctc_loss(
            p_ctc, chars, wav_lens, char_lens,
            blank_index=self.hparams.blank_index,
        )

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
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
        p_head, _ = self.init_module(rng, "ctc_head", enc)
        return {"params": {"extractor": p_ext, "latent_proj": p_proj,
                           "encoder": p_enc, "ctc_head": p_head}}

    def on_stage_start(self, stage, epoch=None):
        if stage != sb.Stage.TRAIN:
            self.cer_metric = ErrorRateStats(space_token=" ")

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            from speechbrain_tpu.nnet.schedulers import update_learning_rate

            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])


def dataio_prepare(hparams):
    datasets = {}
    encoder = hparams["label_encoder"]
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        if split == "train":
            ds = ds.filtered_sorted(sort_key="length")
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda words: list(words), takes="words",
            provides="char_list"
        )
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list",
        sequence_input=True,
        special_labels={"blank_label": hparams["blank_index"]},
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda cl: encoder.encode_sequence_array(cl),
            takes="char_list", provides="char_encoded",
        )
        ds.set_output_keys(["id", "sig", "char_encoded"])
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
    brain = W2VCTC(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adamw)(
            learning_rate=hparams["lr"]
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
                             "shuffle": True,
                             "pad_to_multiple": {"sig": 16000}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"sig": 16000}},
    )
