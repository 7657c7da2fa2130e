#!/usr/bin/env python
"""LibriTTS multi-speaker Tacotron2 (Zero-Shot MSTacotron2) training
(the reference's recipes/LibriTTS/TTS/mstacotron2/train.py re-expressed
for speechbrain_tpu): teacher-forced mel regression + gate BCE + guided
attention, conditioned on per-utterance speaker embeddings added to the
encoder memory. Real runs feed ECAPA speaker embeddings; --debug uses
deterministic per-speaker hash vectors so the pipeline self-provisions.

Expects JSON manifests {utt: {"wav", "words", "spk_id", "length"}}.
Run: ``python train.py hparams/train.yaml --data_folder=...``.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.HifiGAN import mel_spectogram
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.text_to_sequence import text_to_sequence


class MSTacotron2Brain(sb.Brain):
    """Teacher-forced multi-speaker Tacotron2 with the composite loss."""

    def compute_forward(self, params, state, batch, stage, rng):
        text, text_lens = batch["text_sequence"]
        mels, mel_lens = batch["mel"]
        spk_embs, _ = batch["spk_emb"]
        train = stage == sb.Stage.TRAIN
        out, u = self.module_apply(
            "model", params, state, text, text_lens, mels,
            spk_embs=spk_embs, train=train,
            mutable_state=["batch_stats"] if train else [],
            rngs={"dropout": rng},
        )
        return out, self.merge_state(state, "model", u)

    def compute_objectives(self, model_output, batch, stage):
        mels, mel_lens = batch["mel"]
        # stop gate on the PADDED frame grid: 1 from the last true frame on
        T = mels.shape[1]
        gates = (
            jnp.arange(T)[None, :]
            >= jnp.round(mel_lens * T)[:, None] - 1
        ).astype(mels.dtype)
        return self.hparams.criterion(
            model_output, (mels, gates), lengths=mel_lens
        )

    def init_forward(self, rng, eb):
        text, text_lens = eb["text_sequence"]
        mels, _ = eb["mel"]
        rngs = {"params": rng}
        import jax

        rngs["dropout"] = jax.random.fold_in(rng, 1)
        spk_embs, _ = eb["spk_emb"]
        module = self.modules.model
        v = dict(module.init(rngs, text, text_lens, mels,
                             spk_embs=spk_embs))
        out = {"params": {"model": v.pop("params")}}
        for coll, tree in v.items():
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



def prepare_synthetic(data_folder, n_utts=8, sample_rate=16000, seed=0):
    """Tiny (text, tone) pairs for --debug runs / recipe tests."""
    import json

    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    words = ["light", "sound", "voice", "tone"]
    manifests = {"train": {}, "valid": {}}
    for i in range(n_utts):
        idx = [(i + j) % len(words) for j in range(2)]
        sig = np.concatenate([
            np.sin(2 * np.pi * (220 + 90 * w)
                   * np.arange(int(0.2 * sample_rate)) / sample_rate)
            for w in idx
        ]).astype(np.float32) * 0.5
        path = root / f"lj_{i}.wav"
        write_audio(str(path), sig, sample_rate)
        split = "valid" if i >= n_utts - 2 else "train"
        manifests[split][f"lt_{i}"] = {
            "wav": str(path),
            "words": " ".join(words[w] for w in idx),
            "spk_id": f"spk{i % 2}",
            "length": len(sig) / sample_rate,
        }
    for split, manifest in manifests.items():
        with open(root / f"{split}.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)


def dataio_prepare(hparams):
    """Text -> symbol ids; audio -> HiFiGAN mel + stop gate."""
    datasets = {}
    hop = hparams["hop_length"]

    def pipeline(wav, words):
        sig = read_audio(wav)
        mel = mel_spectogram(
            sample_rate=hparams["sample_rate"],
            hop_length=hop,
            win_length=hparams["win_length"],
            n_fft=hparams["n_fft"],
            n_mels=hparams["n_mel_channels"],
            f_min=hparams["mel_fmin"],
            f_max=hparams["mel_fmax"],
            power=1, normalized=False, norm="slaney",
            mel_scale="slaney", compression=True,
            audio=jnp.asarray(sig)[None],
        )[0]
        yield np.asarray(
            text_to_sequence(words, ["english_cleaners"]), np.int32
        )
        yield np.asarray(mel, np.float32)

    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(
            pipeline, takes=["wav", "words"],
            provides=["text_sequence", "mel"],
        )

        def spk_emb_pipeline(spk_id):
            # deterministic per-speaker vector (debug stand-in for the
            # reference's pretrained ECAPA embeddings)
            r = np.random.default_rng(abs(hash(spk_id)) % (2**31))
            return r.standard_normal(
                hparams["spk_emb_size"]
            ).astype(np.float32)

        ds.add_dynamic_item(
            spk_emb_pipeline, takes="spk_id", provides="spk_emb"
        )
        ds.set_output_keys(["id", "text_sequence", "mel", "spk_emb"])
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
        prepare_synthetic(hparams["data_folder"],
                          sample_rate=hparams["sample_rate"])
    datasets = dataio_prepare(hparams)
    brain = MSTacotron2Brain(
        modules=hparams["modules"],
        opt_class=lambda: optax.adamw(
            hparams["lr"], weight_decay=hparams["weight_decay"]
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
                             "pad_to_multiple": {"mel": 64}},
        valid_loader_kwargs={"batch_size": hparams["batch_size"],
                             "pad_to_multiple": {"mel": 64}},
    )
