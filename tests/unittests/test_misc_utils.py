"""Tests for streaming, hpopt, repro, parallel_map, adapters, quantisers,
autoencoders, hypermixing, diffusion."""

import io
import numpy as np
import jax
import jax.numpy as jnp

from speechbrain_tpu.utils.streaming import split_fixed_chunks, split_wav_lens
from speechbrain_tpu.utils.hparams import choice
from speechbrain_tpu.utils.parallel import parallel_map
from speechbrain_tpu.utils.repro import SaveableRNG

KEY = jax.random.PRNGKey(0)


def test_split_chunks():
    chunks = split_fixed_chunks(np.zeros((2, 100)), 30)
    assert [c.shape[-1] for c in chunks] == [30, 30, 30, 10]


def test_choice():
    assert choice("b", {"a": 1, "b": 2}) == 2


def test_parallel_map_thread():
    out = list(parallel_map(lambda x: x + 1, range(20), executor="thread"))
    assert out == list(range(1, 21))


def test_saveable_rng(tmp_path):
    rng = SaveableRNG(7)
    _ = rng.next()
    p = tmp_path / "rng.ckpt"
    rng._save(p)
    k_next = rng.next()
    rng2 = SaveableRNG(0)
    rng2._load(p)
    k_next2 = rng2.next()
    assert np.asarray(k_next).tolist() == np.asarray(k_next2).tolist()


def test_hpopt_context():
    from speechbrain_tpu.utils import hpopt

    out = io.StringIO()
    with hpopt.hyperparameter_optimization(objective_key="error", output=out) as ctx:
        f, ro, ov = ctx.parse_arguments(["hp.yaml", "--hpopt=True", "--lr=0.1"])
        assert ctx.enabled
        hpopt.report_result({"error": 0.25})
    assert "0.25" in out.getvalue()


def test_lora():
    from speechbrain_tpu.nnet.adapters import LoRA

    lora = LoRA(rank=2)
    x = jnp.ones((2, 5, 8))
    w = jnp.ones((8, 4))
    p = lora.init(KEY, x, w)
    out = lora.apply(p, x, w)
    # B initialized to zero -> output == frozen path initially
    assert np.allclose(np.asarray(out), np.asarray(jnp.matmul(x, w)))


def test_quantizers():
    from speechbrain_tpu.nnet.quantisers import (
        GumbelVectorQuantizer,
        RandomProjectionQuantizer,
    )

    q = RandomProjectionQuantizer(input_dim=16, cb_dim=8, cb_vocab=32)
    x = jax.random.normal(KEY, (2, 10, 16))
    v = q.init(KEY, x)
    ids = q.apply(v, x)
    assert ids.shape == (2, 10)
    assert int(ids.max()) < 32

    gq = GumbelVectorQuantizer(dim=16, num_vars=8, groups=2, vq_dim=8)
    vg = gq.init({"params": KEY, "gumbel": KEY}, x, train=True)
    out = gq.apply(vg, x, train=False)
    assert out["x"].shape == (2, 10, 8)


def test_vae():
    from speechbrain_tpu.nnet.autoencoders import VariationalAutoencoder
    from speechbrain_tpu.nnet.linear import Linear

    vae = VariationalAutoencoder(
        encoder=Linear(n_neurons=8), decoder=Linear(n_neurons=16), latent_dim=4
    )
    x = jnp.ones((2, 16))
    v = vae.init({"params": KEY, "latent": KEY}, x)
    out = vae.apply(v, x, rngs={"latent": KEY})
    assert out.rec.shape == (2, 16)
    assert out.mean.shape == (2, 4)


def test_hypermixing():
    from speechbrain_tpu.nnet.hypermixing import HyperMixing

    hm = HyperMixing(input_output_dim=16, hypernet_size=32, num_heads=2)
    x = jax.random.normal(KEY, (2, 10, 16))
    p = hm.init(KEY, x, x, x)
    out, _ = hm.apply(p, x, x, x)
    assert out.shape == (2, 10, 16)


def test_diffusion_roundtrip():
    from speechbrain_tpu.nnet.diffusion import DenoisingDiffusion

    dd = DenoisingDiffusion(model=lambda x, t: jnp.zeros_like(x), timesteps=10)
    x = jnp.ones((2, 8))
    noisy, noise, t = dd.train_sample(x, KEY)
    assert noisy.shape == x.shape
    sample = dd.sample((2, 8), KEY)
    assert np.isfinite(np.asarray(sample)).all()


def test_vad_boundary_logic():
    from speechbrain_tpu.inference.VAD import VAD

    prob = np.zeros((1, 100, 1))
    prob[0, 20:50, 0] = 0.9
    prob[0, 52:60, 0] = 0.9
    th = VAD.apply_threshold(prob, 0.5, 0.25)
    vad = VAD.__new__(VAD)
    vad.hparams = type("H", (), {"time_resolution": 0.01})()
    bounds = VAD.get_boundaries(vad, th)
    assert len(bounds) == 2
    merged = VAD.merge_close_segments(bounds, close_th=0.05)
    assert len(merged) == 1
    kept = VAD.remove_short_segments(merged, len_th=0.2)
    assert len(kept) == 1
