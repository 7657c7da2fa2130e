#!/usr/bin/env python
"""IWSLT22 AST with a SAMU-pretrained encoder and an mBART decoder
(the reference's recipes/IWSLT22_lowresource/AST/transformer/
train_with_samu_mbart.py re-expressed for speechbrain_tpu): identical
wiring to train_with_w2v_mbart.py, but the SSL extractor (+ adapter)
starts from the checkpoint written by train_samu.py — the published
low-resource result (BLEU 13.41 vs 8.75 w2v-only) comes from this
semantic initialization, not from new architecture.

Run: python train_with_samu_mbart.py hparams/train_samu_mbart.yaml \
    --data_folder=... --samu_checkpoint=<samu save dir>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from train_with_w2v_mbart import (  # noqa: E402
    W2VmBARTAST,
    _tiny_mbart_config,
    dataio_prepare,
    make_optimizer,
)

import speechbrain_tpu as sb  # noqa: E402
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml  # noqa: E402

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
        sys.path.insert(
            0, str(Path(__file__).parents[2] / "ST" / "transformer")
        )
        from prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    if hparams.get("mbart") is None:
        # decoder_type: nllb swaps in the NLLB wrapper (the reference's
        # train_*_nllb_st.yaml variants) — same seq2seq surface
        if hparams.get("decoder_type", "mbart") == "nllb":
            from speechbrain_tpu.integrations.huggingface.nllb import (
                NLLB as DecoderModel,
            )
        else:
            from speechbrain_tpu.integrations.huggingface.mbart import (
                mBART as DecoderModel,
            )

        if hparams["mbart_source"] == "debug-tiny":
            src = _tiny_mbart_config(
                hparams["data_folder"], hparams["mbart_vocab"]
            )
            hparams["mbart"] = DecoderModel(src, config_only=True)
        else:
            hparams["mbart"] = DecoderModel(
                hparams["mbart_source"], save_path=hparams["save_folder"],
                target_lang=hparams["target_lang"],
            )
    datasets = dataio_prepare(hparams)
    brain = W2VmBARTAST(
        modules=hparams["modules"],
        opt_class=lambda: make_optimizer(hparams),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )
    if hparams.get("samu_checkpoint"):
        # recover the SAMU-pretrained extractor before fine-tuning
        from speechbrain_tpu.utils.parameter_transfer import Pretrainer

        Pretrainer(
            collect_in=hparams["save_folder"],
            loadables={"extractor": hparams["extractor"]},
            paths={"extractor":
                   f"{hparams['samu_checkpoint']}/extractor.ckpt"},
        ).collect_files()
    brain.fit(
        hparams["epoch_counter"],
        datasets["train"],
        datasets["valid"],
        train_loader_kwargs={"batch_size": hparams["batch_size"],
                             "shuffle": True},
        valid_loader_kwargs={"batch_size": hparams["batch_size"]},
    )
