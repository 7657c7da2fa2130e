#!/usr/bin/env python
"""AMI speaker diarization (the reference's
recipes/AMI/Diarization/experiment.py re-expressed for
speechbrain_tpu): slide a window over each recording, embed windows
with a (pretrained or freshly initialized) ECAPA model, spectral-
cluster the affinity matrix, merge subsegments, write RTTM, and score
DER against the ground truth.

Run: python experiment.py hparams/ecapa.yaml --data_folder=...
In --debug mode a synthetic two-speaker meeting is generated.
"""

import json
import sys
from pathlib import Path

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.alignment.diarization import (
    do_spec_clustering,
    merge_ssegs_same_speaker,
    write_rttm,
)
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.utils.DER import DER
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


def prepare_synthetic(data_folder, sample_rate=16000, seed=0):
    """A 6-second 'meeting': speaker A (low tone) then B (high tone),
    alternating 1.5 s turns."""
    root = Path(data_folder)
    root.mkdir(parents=True, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(seed)
    T = 6 * sample_rate
    t = np.arange(T) / sample_rate
    sig = 0.01 * rng.standard_normal(T).astype(np.float32)
    turns = []
    for k in range(4):
        start, end = 1.5 * k, 1.5 * (k + 1)
        spk = "A" if k % 2 == 0 else "B"
        f = 220 if spk == "A" else 660
        seg = (t >= start) & (t < end)
        sig[seg] += 0.5 * np.sin(2 * np.pi * f * t[seg]).astype(np.float32)
        turns.append({"start": start, "end": end, "spk": spk})
    write_audio(str(root / "meeting.wav"), sig, sample_rate)
    with open(root / "meetings.json", "w") as f:
        json.dump({"meeting": {"wav": str(root / "meeting.wav"),
                               "turns": turns}}, f, indent=1)


def embed_windows(variables, hparams, sig, sample_rate):
    """Slide a window; return (embeddings, subsegments)."""
    win = int(hparams["window_s"] * sample_rate)
    hop = int(hparams["hop_s"] * sample_rate)
    fbank = hparams["compute_features"]
    model = hparams["embedding_model"]
    embs, segs = [], []
    for start in range(0, max(len(sig) - win + 1, 1), hop):
        chunk = sig[None, start : start + win]
        feats = fbank(chunk)
        emb = model.apply(variables, feats, train=False)
        embs.append(np.asarray(emb).reshape(-1))
        segs.append([start / sample_rate, (start + win) / sample_rate])
    return np.stack(embs), segs


def main():
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file, encoding="utf-8") as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
    )
    meta = Path(hparams["data_folder"]) / "meetings.json"
    if not meta.exists() and run_opts.get("debug"):
        prepare_synthetic(hparams["data_folder"])
    with open(meta, encoding="utf-8") as f:
        meetings = json.load(f)

    # init or load the speaker embedder
    model = hparams["embedding_model"]
    example = np.zeros(
        (1, int(hparams["window_s"] * hparams["sample_rate"]))
    )
    feats = hparams["compute_features"](example)
    variables = dict(model.init(jax.random.PRNGKey(0), feats, train=False))
    if hparams.get("pretrainer") is not None:
        from speechbrain_tpu.utils.checkpoints import PytreeRef

        ref = PytreeRef(variables)
        pre = hparams["pretrainer"]
        pre.add_loadables({"embedding_model": ref})
        pre.modules.setdefault("embedding_model", model)
        pre.collect_files()
        pre.load_collected()  # fills ref.tree in place
        variables = ref.tree

    save = Path(hparams["save_folder"])
    save.mkdir(parents=True, exist_ok=True)
    all_der = []
    for rec_id, rec in meetings.items():
        sig = np.asarray(read_audio(rec["wav"]))
        embs, segs = embed_windows(
            variables, hparams, sig, hparams["sample_rate"]
        )
        labels = do_spec_clustering(
            embs,
            n_speakers=hparams.get("oracle_n_speakers"),
            pval=hparams["pval"],
            max_speakers=hparams["max_speakers"],
        )
        segments = [
            (s[0], s[1], int(lab)) for s, lab in zip(segs, labels)
        ]
        segments = merge_ssegs_same_speaker(segments)
        rttm_path = save / f"{rec_id}.rttm"
        write_rttm(segments, rec_id, str(rttm_path))
        # score against ground-truth turns
        ref = [(turn["start"], turn["end"], turn["spk"])
               for turn in rec["turns"]]
        hyp = [(s, e, str(lab)) for s, e, lab in segments]
        der = DER(ref, hyp)
        all_der.append(der)
        print(f"{rec_id}: DER {der:.3f} -> {rttm_path}")
    print(f"avg DER {np.mean(all_der):.3f}")


if __name__ == "__main__":
    main()
