#!/usr/bin/env python
"""Hyperparameter-optimization speaker-ID template (the reference's
templates/hyperparameter_optimization_speaker_id): wraps the speaker_id
recipe in a ``hpopt`` context so an external search driver (e.g. Orion)
can read the reported objective.

Run one trial:
    python train.py train.yaml --data_folder=... \\
        --hpopt hpopt.yaml --hpopt_mode generic

The only changes vs templates/speaker_id are the ``hpopt`` context and
``report_result`` at the end of training.
"""

import sys
from pathlib import Path

import optax

import speechbrain_tpu as sb
from speechbrain_tpu.utils import hpopt as hp
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "speaker_id"))
from train import SpeakerBrain, dataio_prep  # noqa: E402


class HpoSpeakerBrain(SpeakerBrain):
    """SpeakerBrain that reports the objective to the hpopt context."""

    def on_stage_end(self, stage, stage_loss, epoch=None):
        super().on_stage_end(stage, stage_loss, epoch)
        if stage == sb.Stage.VALID:
            hp.report_result({"loss": float(stage_loss), "epoch": epoch})


if __name__ == "__main__":
    with hp.hyperparameter_optimization() as hp_ctx:
        hparams_file, run_opts, overrides = hp_ctx.parse_arguments(
            sys.argv[1:]
        )
        with open(hparams_file, encoding="utf-8") as f:
            hparams = load_hyperpyyaml(f, overrides)
        sb.create_experiment_directory(
            experiment_directory=hparams["output_folder"],
            hyperparams_to_save=hparams_file,
            overrides=overrides,
        )
        datasets = dataio_prep(hparams)
        brain = HpoSpeakerBrain(
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
                                 "shuffle": True, "pad_to_multiple": 2048},
            valid_loader_kwargs={"batch_size": hparams["batch_size"],
                                 "pad_to_multiple": 2048},
        )
