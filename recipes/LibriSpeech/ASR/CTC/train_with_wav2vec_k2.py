#!/usr/bin/env python
"""LibriSpeech wav2vec CTC trained through the NATIVE FSA stack (the
reference's recipes/LibriSpeech/ASR/CTC/train_with_wav2vec_k2.py
re-expressed for speechbrain_tpu): raw wave -> SSL latent extractor ->
transformer encoder -> CTC posteriors; the objective is ``ctc_k2``
over a lexicon-compiled transcript graph (integrations.k2_fsa), and
validation decodes through the HLG 1best lattice decoder — the
graph-based training/decoding pipeline the reference delegates to k2,
served here by the in-repo FSA implementation.

A word-level lexicon is built from the training transcripts
(grapheme spelling) and compiled with prepare_lang; decoding composes
H (ctc topo) ∘ L (lexicon) [∘ G] and runs the jitted Viterbi
intersection.

Run: python train_with_wav2vec_k2.py hparams/train_with_wav2vec_k2.yaml \
    --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import length_to_mask, read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.integrations.k2_fsa.graph_compiler import (
    CtcGraphCompiler,
)
from speechbrain_tpu.integrations.k2_fsa.lexicon import Lexicon
from speechbrain_tpu.integrations.k2_fsa.prepare_lang import prepare_lang
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class W2VK2CTC(sb.Brain):
    """SSL extractor -> transformer encoder -> graph-compiled CTC."""

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
        # the transcript graphs are compiled HOST-side in the data
        # pipeline (strings cannot ride the jitted batch); this is
        # exactly ctc_k2's compile->ctc_loss split (losses.py:14)
        wavs, wav_lens = batch["sig"]
        tokens, tok_lens = batch["graph_tokens"]
        from speechbrain_tpu.nnet.losses import ctc_loss

        return ctc_loss(
            p_ctc, tokens, wav_lens, tok_lens, blank_index=0,
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

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.VALID:
            from speechbrain_tpu.nnet.schedulers import update_learning_rate

            old_lr, new_lr = self.hparams.lr_annealing(stage_loss)
            self.opt_state = update_learning_rate(self.opt_state, new_lr)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr": old_lr},
                train_stats={"loss": self.train_loss},
                valid_stats={"loss": stage_loss},
            )
            self.save_checkpoint(meta={"loss": stage_loss},
                                 min_keys=["loss"])

    def decode_hlg(self, dataset, batch_size=2):
        """HLG 1best decoding of a dataset through the native lattice
        decoder (reference decode with k2 HLG)."""
        from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
            get_decoding,
        )

        decoding = get_decoding(
            decoding_method="1best",
            lexicon=self.hparams.graph_compiler.lexicon,
        )
        decoder = decoding["decoding_method"]
        loader = self.make_dataloader(
            dataset, sb.Stage.TEST, ckpt_prefix=None,
            batch_size=batch_size,
        )
        out = []
        for batch in loader:
            db = self._prepare_batch(batch)
            p_ctc, _ = self.compute_forward(
                self.params, self.model_state, db, sb.Stage.TEST, None
            )
            wavs, wav_lens = db["sig"]
            hyps = decoder(p_ctc, wav_lens)
            out += [" ".join(h) for h in hyps]
        return out


def _build_lang(data_folder, manifests):
    """Grapheme-spelling lexicon from the training transcripts."""
    import json

    lang_dir = Path(data_folder) / "lang"
    if (lang_dir / "lexicon.txt").exists():
        return str(lang_dir)
    lang_dir.mkdir(parents=True, exist_ok=True)
    words = set()
    for m in manifests:
        if Path(m).exists():
            with open(m, encoding="utf-8") as f:
                for entry in json.load(f).values():
                    words.update(entry["words"].split())
    lines = [
        f"{w} {' '.join(list(w))}" for w in sorted(words)
    ]
    (lang_dir / "lexicon.txt").write_text("\n".join(lines) + "\n")
    prepare_lang(str(lang_dir))
    return str(lang_dir)


def dataio_prepare(hparams):
    import numpy as np

    compiler = hparams["graph_compiler"]
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def graph_tokens(words):
            ids = [
                compiler.token2ctc[t]
                for t in compiler.lexicon.texts_to_token_ids([words])[0]
            ]
            return np.asarray(ids, np.int32)

        ds.add_dynamic_item(
            graph_tokens, takes="words", provides="graph_tokens"
        )
        ds.set_output_keys(["id", "sig", "graph_tokens"])
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

        prepare_synthetic(hparams["data_folder"])
    lang_dir = _build_lang(
        hparams["data_folder"],
        [hparams["train_annotation"], hparams["valid_annotation"]],
    )
    lexicon = Lexicon(lang_dir)
    hparams["graph_compiler"] = CtcGraphCompiler(lexicon)
    # the CTC head must cover blank + every lexicon token (the yaml's
    # output_neurons is an upper bound; extra classes are never indexed
    # by the graphs and are simply unused probability mass)
    needed = len(lexicon.tokens) + 1
    if hparams["output_neurons"] < needed:
        raise ValueError(
            f"output_neurons={hparams['output_neurons']} < "
            f"{needed} (blank + lexicon tokens); raise it in the yaml"
        )
    datasets = dataio_prepare(hparams)
    brain = W2VK2CTC(
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
    if run_opts.get("debug"):
        # exercise the native HLG decode path end-to-end
        hyps = brain.decode_hlg(datasets["valid"])
        print(f"HLG 1best decoded {len(hyps)} valid utterances")
