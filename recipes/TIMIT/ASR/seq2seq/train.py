#!/usr/bin/env python
"""TIMIT phoneme seq2seq ASR (the reference's
recipes/TIMIT/ASR/seq2seq/train.py re-expressed for speechbrain_tpu):
CRDNN encoder + attentional GRU decoder over the phoneme inventory,
joint CTC/attention objective.

Run: python train.py hparams/train.yaml --data_folder=$TIMIT
"""

import sys
from pathlib import Path

import jax
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """CRDNN encoder -> attentional GRU decoder -> CTC & seq heads."""

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tokens_bos, _ = batch["tokens_bos"]
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []

        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, wav_lens)
        enc, u1 = self.module_apply(
            "enc", params, state, feats, train=train, mutable_state=mut,
            rngs={"dropout": rng} if train else None,
        )
        emb, _ = self.module_apply(
            "emb", params, state, tokens_bos, mutable_state=[]
        )
        dec_out, _ = self.module_apply(
            "dec", params, state, emb, enc, wav_lens, mutable_state=[]
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        seq_logits, _ = self.module_apply(
            "seq_lin", params, state, dec_out, mutable_state=[]
        )
        ctc_logits, _ = self.module_apply(
            "ctc_lin", params, state, enc, mutable_state=[]
        )
        ns = self.merge_state(state, "enc", u1)
        return (
            jax.nn.log_softmax(ctc_logits, -1),
            jax.nn.log_softmax(seq_logits, -1),
        ), ns

    def compute_objectives(self, predictions, batch, stage):
        p_ctc, p_seq = predictions
        wavs, wav_lens = batch["sig"]
        tokens, tok_lens = batch["tokens"]
        tokens_eos, tok_eos_lens = batch["tokens_eos"]
        w = self.hparams.ctc_weight
        loss_ctc = ctc_loss(
            p_ctc, tokens, wav_lens, tok_lens,
            blank_index=self.hparams.blank_index,
        )
        loss_seq = nll_loss(
            p_seq, tokens_eos, length=tok_eos_lens,
            label_smoothing=self.hparams.label_smoothing,
        )
        return w * loss_ctc + (1 - w) * loss_seq

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tokens_bos, _ = eb["tokens_bos"]
        feats = self.hparams.compute_features(wavs)
        p_enc, s_enc = self.init_module(rng, "enc", feats, train=False)
        enc, _ = self.module_apply(
            "enc", {"enc": p_enc},
            {k: {"enc": v} for k, v in s_enc.items()}, feats, train=False,
        )
        p_emb, _ = self.init_module(rng, "emb", tokens_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tokens_bos)
        p_dec, _ = self.init_module(rng, "dec", emb, enc, wav_lens)
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, enc, wav_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_seq, _ = self.init_module(rng, "seq_lin", dec_out)
        p_ctc, _ = self.init_module(rng, "ctc_lin", enc)
        out = {"params": {"enc": p_enc, "emb": p_emb, "dec": p_dec,
                          "seq_lin": p_seq, "ctc_lin": p_ctc}}
        for coll, tree in s_enc.items():
            out[coll] = {"enc": tree}
        return out

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

    def make_searcher(self, beam_size):
        """Bind the trained decoder into an S2SRNNBeamSearcher."""
        from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

        params = self.params

        def step_fn(inp_tokens, memory, enc_states, enc_lens):
            emb, _ = self.module_apply("emb", params, {}, inp_tokens[:, None])
            out, new_state, attn = self.modules.dec.apply(
                {"params": params["dec"]}, emb[:, 0], memory, enc_states,
                enc_lens, method="forward_step",
            )
            logits, _ = self.module_apply("seq_lin", params, {}, out)
            return jax.nn.log_softmax(logits, axis=-1), new_state, attn

        def init_fn(batch_size, enc_states, enc_lens):
            import jax.numpy as jnp

            state = self.modules.dec.apply(
                {"params": params["dec"]}, batch_size, enc_states.shape[1],
                method="init_state",
            )
            T = enc_states.shape[1]
            mask0 = (
                jnp.arange(T)[None, :] < jnp.round(enc_lens * T)[:, None]
            ).astype(jnp.float32)
            state["prev_attn"] = mask0 / jnp.maximum(
                mask0.sum(-1, keepdims=True), 1.0
            )
            return state

        return S2SRNNBeamSearcher(
            step_fn=step_fn, init_fn=init_fn,
            bos_index=self.hparams.bos_index,
            eos_index=self.hparams.eos_index,
            min_decode_ratio=self.hparams.min_decode_ratio,
            max_decode_ratio=self.hparams.max_decode_ratio,
            beam_size=beam_size,
            eos_threshold=self.hparams.eos_threshold,
        )

    def transcribe_dataset(self, dataset, phone_map, beam_size=8):
        """Beam-decode a dataset and return an ErrorRateStats summary."""
        searcher = self.make_searcher(beam_size)
        wer = ErrorRateStats()
        loader = self.make_dataloader(
            dataset, sb.Stage.TEST, ckpt_prefix=None,
            batch_size=self.hparams.test_batch_size,
        )
        for batch in loader:
            device_batch = self._prepare_batch(batch)
            wavs, wav_lens = device_batch["sig"]
            feats = self.hparams.compute_features(wavs)
            feats = self.hparams.normalize(feats, wav_lens)
            enc, _ = self.module_apply(
                "enc", self.params, self.model_state, feats, train=False,
                mutable_state=[],
            )
            hyps, _, _, _ = searcher(enc, wav_lens)
            inv = {v: k for k, v in phone_map.items()}
            preds = [[inv.get(t, "?") for t in h] for h in hyps]
            refs = [w.split() for w in batch["phn"]]
            wer.append(batch["id"], preds, refs)
        return wer


def build_phone_map(hparams):
    """Phone -> id map from the training manifest; 0/1/2 reserved for
    blank/bos/eos (matching the yaml's blank/bos/eos indices)."""
    import json

    with open(hparams["train_annotation"], encoding="utf-8") as f:
        items = json.load(f)
    phones = sorted({p for e in items.values() for p in e["phn"].split()})
    return {p: i + 3 for i, p in enumerate(phones)}


def dataio_prepare(hparams, phone_map):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation"),
                       ("test", "test_annotation")):
        path = hparams[key]
        if not Path(path).exists():
            if split == "test":
                continue
            raise FileNotFoundError(
                f"{path} missing; run timit_prepare.py first"
            )
        ds = DynamicItemDataset.from_json(
            path, replacements={"data_root": hparams["data_folder"]}
        )
        if split == "train":
            ds = ds.filtered_sorted(sort_key="length")
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def tokens_pipeline(phn):
            ids = [phone_map.get(p, 3) for p in phn.split()]
            yield np.asarray(ids, np.int32)
            yield np.asarray([hparams["bos_index"]] + ids, np.int32)
            yield np.asarray(ids + [hparams["eos_index"]], np.int32)

        ds.add_dynamic_item(
            tokens_pipeline, takes="phn",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "phn", "tokens", "tokens_bos", "tokens_eos"]
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
    if not Path(hparams["train_annotation"]).exists() and run_opts.get(
        "debug"
    ):
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from timit_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    phone_map = build_phone_map(hparams)
    datasets = dataio_prepare(hparams, phone_map)
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda: optax.inject_hyperparams(optax.adadelta)(
            learning_rate=hparams["lr"], rho=0.95, eps=1e-8
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
    if "test" in datasets and not run_opts.get("debug"):
        wer = brain.transcribe_dataset(
            datasets["test"], phone_map,
            beam_size=hparams["test_beam_size"],
        )
        with open(Path(hparams["output_folder"]) / "wer_test.txt", "w") as f:
            wer.write_stats(f)
