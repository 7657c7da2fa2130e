#!/usr/bin/env python
"""LibriSpeech character CTC over a wav2vec2-style raw-waveform encoder
(the reference's recipes/LibriSpeech/ASR/CTC/train_with_wav2vec.py
re-expressed for speechbrain_tpu): strided-conv latent extractor ->
transformer encoder -> CTC over characters.

The reference fine-tunes a HuggingFace wav2vec2 checkpoint; this recipe
uses the framework-native W2VLatentExtractor + TransformerEncoder stack
(lobes/models/wav2vec.py) so it is trainable from scratch and, via
Pretrainer + utils/torch_convert, from a poured torch checkpoint.

Run: python train_with_wav2vec.py hparams/train_with_wav2vec.yaml \
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
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class W2VCTC(sb.Brain):
    """W2V latent extractor -> transformer encoder -> char CTC."""

    def _downsample(self, params, state, wavs):
        """Optional input downsampling (the reference's downsampled/
        configs, ref recipes/LibriSpeech/ASR/CTC/hparams/downsampled/):
        a host-side decimator from hparams, or a learned module."""
        ds = getattr(self.hparams, "downsampler", None)
        if ds is not None:
            return ds(wavs)
        if "downsampler" in params.get("params", params):
            wavs, _ = self.module_apply(
                "downsampler", params, state, wavs, mutable_state=[]
            )
        return wavs

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        train = stage == sb.Stage.TRAIN
        wavs = self._downsample(params, state, wavs)
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
        extra = {}
        if hasattr(self.modules, "downsampler"):
            p_ds, _ = self.init_module(rng, "downsampler", wavs)
            extra["downsampler"] = p_ds
            wavs, _ = self.module_apply(
                "downsampler", {"downsampler": p_ds}, {}, wavs
            )
        elif getattr(self.hparams, "downsampler", None) is not None:
            wavs = self.hparams.downsampler(wavs)
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
                           "encoder": p_enc, "ctc_head": p_head, **extra}}

    def on_stage_start(self, stage, epoch=None):
        if stage != sb.Stage.TRAIN:
            self.cer_metric = ErrorRateStats(space_token=" ")

    def evaluate_batch(self, batch, stage):
        """Adds the reference's n-best rescoring eval path (ref
        recipes/LibriSpeech/ASR/CTC/hparams/
        train_hf_wav2vec_{rnn,transformer}_rescoring.yaml): when the
        config wires ``test_beam_searcher`` + ``rescorer``, decode the
        CTC posteriors with topk beam search, rerank with the
        second-pass LM, and score CER on the reranked 1-best."""
        loss = super().evaluate_batch(batch, stage)
        searcher = getattr(self.hparams, "test_beam_searcher", None)
        rescorer = getattr(self.hparams, "rescorer", None)
        if searcher is not None and rescorer is not None:
            b = self._prepare_batch(batch)
            logp, _ = self.compute_forward(
                self.params, self.model_state, b, stage, self.rng
            )
            topk = searcher(np.asarray(logp), np.asarray(b["sig"][1]))
            hyps = [[list(beam.text) for beam in row] for row in topk]
            scores = [[float(beam.score) for beam in row] for row in topk]
            best, _, _ = rescorer.rescore(hyps, scores)
            chars, char_lens = batch["char_encoded"]
            self.cer_metric.append(
                batch["id"], best, np.asarray(chars),
                target_len=np.asarray(char_lens),
            )
        return loss

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            from speechbrain_tpu.nnet.schedulers import update_learning_rate

            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            valid_stats = {"loss": stage_loss}
            if getattr(self, "cer_metric", None) and self.cer_metric.ids:
                valid_stats["CER"] = self.cer_metric.summarize("error_rate")
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats=valid_stats,
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
            lambda words: list(words), takes="words", provides="char_list"
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
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    datasets = dataio_prepare(hparams)
    if "rescorer_lm" in hparams:
        # Build the n-best rescorer from the config's LM (ref rescoring
        # configs load a trained LM through a Pretrainer; under --debug
        # the randomly-initialised LM still exercises the full path).
        from speechbrain_tpu.decoders.scorer import (
            RescorerBuilder,
            RNNLMRescorer,
            TransformerLMRescorer,
        )

        lm = hparams["rescorer_lm"]
        lm_vars = lm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32)
        )
        if hparams.get("rescorer_type", "rnn") == "rnn":
            def lm_fn(tokens, state):
                return lm.apply(lm_vars, tokens, hx=state)

            rescorer_impl = RNNLMRescorer(
                lm_fn, lambda n: None, bos_index=hparams["bos_index"],
                eos_index=hparams["eos_index"],
            )
        else:
            def lm_fn(tokens):
                return lm.apply(lm_vars, tokens)

            rescorer_impl = TransformerLMRescorer(
                lm_fn, bos_index=hparams["bos_index"],
                eos_index=hparams["eos_index"],
            )
        hparams["rescorer"] = RescorerBuilder(
            weights={"lm": hparams.get("rescorer_weight", 0.5)},
            rescorers={"lm": rescorer_impl},
        )
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
