#!/usr/bin/env python
"""LibriTTS FastSpeech2 training with internal alignment (the
reference's recipes/LibriTTS/TTS recipe re-expressed for
speechbrain_tpu): character tokens -> FastSpeech2WithAlignment, which
learns durations via its internal aligner + monotonic alignment search
(no external duration targets needed), trained with the combined
mel/variance/alignment loss.

Run: python train.py hparams/train.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import TextEncoder
from speechbrain_tpu.lobes.models.HifiGAN import mel_spectogram
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class FastSpeech2Brain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        tokens, tok_lens = batch["tokens"]
        mel, mel_lens = batch["mel"]
        train = stage == sb.Stage.TRAIN
        out, _ = self.module_apply(
            "model", params, state, tokens, mel, mutable_state=[],
            rngs={"dropout": rng} if train else None,
        )
        return out, state

    def compute_objectives(self, out, batch, stage):
        tokens, tok_lens = batch["tokens"]
        mel, mel_lens = batch["mel"]
        mel_frames, _ = batch["mel_frames"]
        targets = {
            "mel": mel,
            "token_lens": jnp.round(
                tok_lens * tokens.shape[1]
            ).astype(jnp.int32),
            "mel_frame_lens": jnp.asarray(mel_frames).reshape(-1).astype(
                jnp.int32
            ),
        }
        return self.hparams.criterion(out, targets)

    def init_forward(self, rng, eb):
        tokens, _ = eb["tokens"]
        mel, _ = eb["mel"]
        p, s = self.init_module(rng, "model", tokens, mel)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
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


def dataio_prepare(hparams):
    h = hparams
    encoder = TextEncoder()
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(
            lambda words: list(words), takes="words", provides="char_list"
        )
        datasets[split] = ds
    encoder.load_or_create(
        path=f"{hparams['save_folder']}/char_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="char_list", sequence_input=True,
    )
    for ds in datasets.values():
        ds.add_dynamic_item(
            lambda cl: encoder.encode_sequence_array(cl),
            takes="char_list", provides="tokens",
        )

        def mel_pipeline(wav):
            sig = np.asarray(read_audio(wav))[None]
            mel = np.asarray(mel_spectogram(
                jnp.asarray(sig),
                sample_rate=h["sample_rate"], hop_length=h["hop_length"],
                win_length=h["win_length"], n_fft=h["n_fft"],
                n_mels=h["n_mels"], f_min=h["f_min"], f_max=h["f_max"],
                power=1, normalized=False, norm="slaney",
                mel_scale="slaney", compression=True,
            )[0])
            # static decoder shape: pad/crop to max_mel_len, but keep
            # the true frame count for the alignment losses
            L = h["max_mel_len"]
            n_frames = min(mel.shape[0], L)
            if mel.shape[0] < L:
                mel = np.pad(mel, ((0, L - mel.shape[0]), (0, 0)))
            yield mel[:L]
            yield np.int32(n_frames)

        ds.add_dynamic_item(mel_pipeline, takes="wav",
                            provides=["mel", "mel_frames"])
        ds.set_output_keys(["id", "tokens", "mel", "mel_frames"])
    return datasets, encoder


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
        from libritts_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets, encoder = dataio_prepare(hparams)
    brain = FastSpeech2Brain(
        modules={"model": hparams["model"]},
        opt_class=lambda: optax.adam(hparams["lr"]),
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
                             "pad_to_multiple": {"mel": 32, "tokens": 8}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"mel": 32, "tokens": 8}},
    )
