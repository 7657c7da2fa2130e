#!/usr/bin/env python
"""VoxCeleb speaker verification with cosine scoring (the reference's
recipes/VoxCeleb/SpeakerRec/speaker_verification_cosine.py): embed
enrol/test utterances with a trained ECAPA model, score trial pairs by
cosine similarity, report EER and minDCF.

Trials file format (veri_test2.txt): ``label enrol_wav test_wav`` per
line (label 1 = same speaker).
"""

import sys

import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import EER, minDCF


def embed(brain_modules, hparams, params, wav_path, cache,
          model_state=None):
    """Embedding for one utterance (cached)."""
    if wav_path in cache:
        return cache[wav_path]
    sig = read_audio(wav_path)[None]
    feats = hparams["compute_features"](jnp.asarray(sig))
    variables = {"params": params["embedding_model"]}
    for coll, tree in (model_state or {}).items():
        if "embedding_model" in tree:
            variables[coll] = tree["embedding_model"]
    emb = brain_modules["embedding_model"].apply(
        variables, feats, train=False
    )
    emb = np.asarray(emb).reshape(-1)
    emb = emb / (np.linalg.norm(emb) + 1e-9)
    cache[wav_path] = emb
    return emb


def main():
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file, encoding="utf-8") as f:
        hparams = load_hyperpyyaml(f, overrides)
    ckpt = hparams["checkpointer"]
    loaded = ckpt.recover_if_possible()
    if loaded is None:
        raise RuntimeError("no checkpoint found; train first")
    params = hparams["params_ref"].tree if "params_ref" in hparams else None
    if params is None:
        raise RuntimeError(
            "hparams must expose params_ref (PytreeRef registered with the "
            "checkpointer) holding the trained parameters"
        )
    model_state = (
        hparams["model_state_ref"].tree
        if "model_state_ref" in hparams and hparams["model_state_ref"].tree
        else {}
    )

    cache = {}
    plda = None
    if hparams.get("scoring", "cosine") == "plda":
        # Train a two-covariance PLDA backend on labelled embeddings
        # (the reference's verification_plda_xvector.yaml flow).
        import json

        from speechbrain_tpu.processing.PLDA_LDA import PLDA, StatObject

        with open(hparams["plda_train_annotation"],
                  encoding="utf-8") as f:
            entries = json.load(f)
        vecs, spks = [], []
        for utt, e in entries.items():
            vecs.append(embed(hparams["modules"], hparams, params,
                              e["wav"], cache,
                              model_state=model_state))
            spks.append(e["spk_id"])
        stats = StatObject(
            np.asarray(spks), np.arange(len(vecs)),
            stat1=np.asarray(vecs),
        )
        plda = PLDA(rank_f=hparams.get("plda_rank_f", 100)).plda(stats)

    scores, labels = [], []
    with open(hparams["verification_file"], encoding="utf-8") as f:
        for line in f:
            lab, enrol, test = line.split()
            e = embed(hparams["modules"], hparams, params,
                      f"{hparams['data_folder']}/{enrol}", cache,
                      model_state=model_state)
            t = embed(hparams["modules"], hparams, params,
                      f"{hparams['data_folder']}/{test}", cache,
                      model_state=model_state)
            if plda is not None:
                scores.append(plda.score_pair(e, t))
            else:
                scores.append(float(np.dot(e, t)))
            labels.append(int(lab))
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    eer, thr = EER(scores[labels == 1], scores[labels == 0])
    dcf, _ = minDCF(scores[labels == 1], scores[labels == 0])
    print(f"EER: {100 * eer:.2f}%  minDCF: {dcf:.4f}  (thr {thr:.3f})")
    return eer


if __name__ == "__main__":
    main()
