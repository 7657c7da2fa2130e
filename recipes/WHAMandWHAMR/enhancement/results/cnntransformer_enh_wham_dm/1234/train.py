#!/usr/bin/env python
"""WHAM! / WHAMR! speech enhancement (the reference's
recipes/WHAMandWHAMR/enhancement/train.py re-expressed for
speechbrain_tpu): the separation machinery run with ``num_spks: 1``.

Two model families, as in the reference:

* time-domain (default, ``use_freq_domain: False``): the masking
  network (SepFormer / ConvTasNet / DPRNN) maps the raw mixture to the
  clean waveform and trains with SI-SNR.
* freq-domain (``use_freq_domain: True``; the CNNTransformer / BLSTM /
  2DFCN configs): STFT -> log1p(sqrt-magnitude) -> mask -> expm1 ->
  resynthesize with the noisy phase; trains with spectral MSE
  (ref train.py:103-151).

``dynamic_mixing: True`` re-draws the noise gain per step (the
reference's on-the-fly wsj0+noise remixing re-expressed over the
indexed pair: noise = mix - s1, scaled U(0.5, 1.5)).

Run: python train.py hparams/sepformer-wham.yaml --data_folder=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import cal_si_snr
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


class Enhancement(sb.Brain):
    """Mask-based single-source enhancement (SI-SNR or spectral MSE)."""

    def _feats(self, wavs):
        spec = self.hparams.compute_stft(wavs)
        return jnp.log1p(spectral_magnitude(spec, power=0.5))

    def compute_forward(self, params, state, batch, stage, rng):
        mix, lens = batch["mix_sig"]
        train = stage == sb.Stage.TRAIN
        if train and getattr(self.hparams, "dynamic_mixing", False):
            clean, _ = batch["s1_sig"]
            gain = jax.random.uniform(
                rng, (mix.shape[0], 1), minval=0.5, maxval=1.5
            )
            mix = clean + gain * (mix - clean)
        if getattr(self.hparams, "use_freq_domain", False):
            feats = self._feats(mix)
            mask, u = self.module_apply(
                "model", params, state, feats, train=train,
                rngs={"dropout": rng} if train else None,
                mutable_state=["batch_stats"] if train else [],
            )
            return feats * mask, self.merge_state(state, "model", u)
        est, _ = self.module_apply(
            "model", params, state, mix, train=train, mutable_state=[],
        )
        return est, state

    def compute_objectives(self, est, batch, stage):
        clean, _ = batch["s1_sig"]
        if getattr(self.hparams, "use_freq_domain", False):
            # spectral MSE against the clean features (ref train.py:145)
            return jnp.mean((est - self._feats(clean)) ** 2)
        # est is (B, T, num_spks=1); SI-SNR against the clean source
        return jnp.mean(cal_si_snr(clean[..., None], est))

    def init_forward(self, rng, eb):
        mix, lens = eb["mix_sig"]
        if getattr(self.hparams, "use_freq_domain", False):
            mix = self._feats(mix)
        p, s = self.init_module(rng, "model", mix, train=False)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            return
        self.hparams.train_logger.log_stats(
            stats_meta={"epoch": epoch},
            train_stats={"si-snr": self.train_loss},
            valid_stats={"si-snr": stage_loss},
        )
        self.save_checkpoint(meta={"si-snr": stage_loss},
                             min_keys=["si-snr"])


def dataio_prepare(hparams):
    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="mix_wav", provides="mix_sig")
        ds.add_dynamic_item(read_audio, takes="s1_wav", provides="s1_sig")
        ds.set_output_keys(["id", "mix_sig", "s1_sig"])
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
        # the separation prepare writes mixtures + clean sources
        sys.path.insert(0, str(Path(__file__).parents[1] / "separation"))
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"],
                          reverb=hparams.get("use_reverb", False))
    datasets = dataio_prepare(hparams)
    brain = Enhancement(
        modules=hparams["modules"],
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
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
