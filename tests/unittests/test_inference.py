"""Tests for the Pretrained inference interfaces: build a local model dir
with hyperparams.yaml + saved params, then load via from_hparams."""

import numpy as np
import jax
import jax.numpy as jnp

from speechbrain_tpu.dataio.dataio import write_audio
from speechbrain_tpu.inference.classifiers import EncoderClassifier
from speechbrain_tpu.inference.speaker import SpeakerRecognition
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
from speechbrain_tpu.utils.checkpoints import save_pytree

KEY = jax.random.PRNGKey(0)

HPARAMS_YAML = """
sample_rate: 16000
n_mels: 24
compute_features: !new:speechbrain_tpu.lobes.features.Fbank
  n_mels: !ref <n_mels>
embedding_model: !new:speechbrain_tpu.lobes.models.Xvector.Xvector
  in_channels: !ref <n_mels>
  tdnn_channels: !tuple (16, 16, 16, 16, 32)
  lin_neurons: 8
classifier: !new:speechbrain_tpu.lobes.models.Xvector.Classifier
  out_neurons: 3
  lin_neurons: 8
modules:
  embedding_model: !ref <embedding_model>
  classifier: !ref <classifier>
label_encoder: !new:speechbrain_tpu.dataio.encoder.CategoricalEncoder
pretrainer: !new:speechbrain_tpu.utils.parameter_transfer.Pretrainer
  loadables:
    params_embedding_model: !new:speechbrain_tpu.utils.checkpoints.PytreeRef
    params_classifier: !new:speechbrain_tpu.utils.checkpoints.PytreeRef
    state_embedding_model: !new:speechbrain_tpu.utils.checkpoints.PytreeRef
    state_classifier: !new:speechbrain_tpu.utils.checkpoints.PytreeRef
"""


def _build_model_dir(tmp_path):
    src = tmp_path / "model_src"
    src.mkdir()
    (src / "hyperparams.yaml").write_text(HPARAMS_YAML)
    # init params and save them in the source dir
    fbank = Fbank(n_mels=24)
    emb = Xvector(in_channels=24, tdnn_channels=(16, 16, 16, 16, 32), lin_neurons=8)
    clf = Classifier(out_neurons=3, lin_neurons=8)
    x = fbank(jnp.ones((1, 8000)))
    v_e = emb.init(KEY, x, train=False)
    e_out = emb.apply(v_e, x, train=False)
    v_c = clf.init(KEY, e_out, train=False)
    save_pytree(v_e["params"], src / "params_embedding_model.ckpt")
    save_pytree(v_c["params"], src / "params_classifier.ckpt")
    save_pytree({"batch_stats": v_e["batch_stats"]}, src / "state_embedding_model.ckpt")
    save_pytree({"batch_stats": v_c["batch_stats"]}, src / "state_classifier.ckpt")
    return src, (v_e, v_c, fbank, emb, clf)


def test_from_hparams_and_classify(tmp_path):
    src, (v_e, v_c, fbank, emb, clf) = _build_model_dir(tmp_path)
    model = EncoderClassifier.from_hparams(
        source=str(src), savedir=str(tmp_path / "save")
    )
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8000)), jnp.float32)
    out_prob, score, index, _ = model.classify_batch(wav)
    assert out_prob.shape == (1, 3)
    # must match direct application of the saved params
    feats = fbank(wav)
    e = emb.apply(v_e, feats, lengths=jnp.ones(1), train=False)
    ref = clf.apply(v_c, e, train=False)[:, 0]
    assert np.allclose(np.asarray(out_prob), np.asarray(ref), atol=1e-5)


def test_speaker_verification(tmp_path):
    src, _ = _build_model_dir(tmp_path)
    model = SpeakerRecognition.from_hparams(
        source=str(src), savedir=str(tmp_path / "save2")
    )
    rng = np.random.default_rng(0)
    wav1 = jnp.asarray(np.sin(np.arange(8000) * 0.05), jnp.float32)[None]
    wav2 = jnp.asarray(np.sin(np.arange(8000) * 0.05 + 1), jnp.float32)[None]
    wav3 = jnp.asarray(rng.standard_normal(8000), jnp.float32)[None]
    score_same, _ = model.verify_batch(wav1, wav2)
    score_diff, _ = model.verify_batch(wav1, wav3)
    assert score_same.shape == (1,)
    assert -1.0 <= float(score_same[0]) <= 1.0


def test_classify_file(tmp_path):
    src, _ = _build_model_dir(tmp_path)
    model = EncoderClassifier.from_hparams(
        source=str(src), savedir=str(tmp_path / "save3")
    )
    wav_path = str(tmp_path / "t.wav")
    write_audio(wav_path, np.sin(np.arange(8000) * 0.1).astype(np.float32), 16000)
    out_prob, score, index, _ = model.classify_file(wav_path)
    assert out_prob.shape == (1, 3)
