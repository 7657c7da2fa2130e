"""MetricGAN-U end-to-end: the unsupervised enhancement recipe must
train (alternating D/G steps with the native SRMR-like target), log a
falling discriminator loss, and track STOI against the clean eval
reference (the reference's recipes/Voicebank/enhance/MetricGAN-U
training contract)."""

import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def test_metricgan_u_overfits_discriminator(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    recipe = REPO / "recipes/VoiceBank/enhance/MetricGAN-U"
    proc = subprocess.run(
        [sys.executable, "train.py", "hparams/train.yaml",
         f"--data_folder={tmp_path}/data",
         f"--output_folder={tmp_path}/out",
         "--debug", "--debug_batches=3", "--debug_epochs=6",
         "--batch_size=2"],
        cwd=recipe, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    log = (tmp_path / "out" / "train_log.txt").read_text()
    d_losses = [
        float(m) for m in re.findall(r"train d_loss: ([0-9.e+-]+)", log)
    ]
    stoi = re.findall(r"stoi_loss: ([0-9.e+-]+)", log)
    assert len(d_losses) >= 4 and len(stoi) >= 1
    # the discriminator regression must improve over training
    assert min(d_losses[2:]) < d_losses[0]
