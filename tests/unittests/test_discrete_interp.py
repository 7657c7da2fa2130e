"""Tests for DAC codec, audio tokenizers, L2I/PIQ interpretability, BEATs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dac_roundtrip_shapes():
    from speechbrain_tpu.lobes.models.discrete.dac import DAC

    dac = DAC(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32,
              decoder_rates=(4, 2), n_codebooks=3, codebook_size=16,
              codebook_dim=4)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 1))
    v = dac.init(jax.random.PRNGKey(1), audio)
    out = dac.apply(v, audio)
    assert out["audio"].shape == (2, 64, 1)
    assert out["codes"].shape == (2, 3, 8)  # 64 / (2*4)
    assert out["z"].shape == (2, 8, 32)  # latent_dim = 8 * 2^2
    assert jnp.isfinite(out["vq/commitment_loss"])

    # from_codes reconstructs the same z_q
    zq2, _, _ = dac.apply(v, out["codes"],
                          method=lambda m, c: m.quantizer.from_codes(c))
    np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(zq2),
                               rtol=1e-5, atol=1e-5)


def test_dac_straight_through_gradients():
    from speechbrain_tpu.lobes.models.discrete.dac import DAC

    dac = DAC(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32,
              decoder_rates=(4, 2), n_codebooks=2, codebook_size=8,
              codebook_dim=4)
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 1))
    v = dac.init(jax.random.PRNGKey(1), audio)

    def loss(p):
        out = dac.apply(p, audio)
        return jnp.mean((out["audio"] - audio) ** 2) + out[
            "vq/commitment_loss"
        ]

    g = jax.grad(loss)(v)
    enc_leaf = jax.tree_util.tree_leaves(g["params"]["encoder"])
    assert any(float(jnp.abs(x).max()) > 0 for x in enc_leaf)


def test_minibatch_kmeans():
    from speechbrain_tpu.integrations.audio_tokenizers.kmeans import (
        MiniBatchKMeans,
    )

    rng = np.random.default_rng(0)
    centers = np.asarray([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    x = np.concatenate(
        [rng.normal(c, 0.1, (100, 2)) for c in centers]
    ).astype("float32")
    rng.shuffle(x)
    km = MiniBatchKMeans(n_clusters=3, seed=0)
    for _ in range(3):
        for i in range(0, 300, 50):
            km.partial_fit(x[i : i + 50])
    x = np.concatenate(
        [rng.normal(c, 0.1, (100, 2)) for c in centers]
    ).astype("float32")
    labels = np.asarray(km(x))
    # all points of one blob share a label
    assert len(set(labels[:100])) == 1
    assert len({labels[0], labels[100], labels[200]}) == 3
    assert km.inertia(x) < 100.0


def test_discrete_ssl_encode_decode():
    from speechbrain_tpu.integrations.audio_tokenizers.discrete_ssl import (
        DiscreteSSL,
    )

    D, K = 6, 5
    cb1 = jax.random.normal(jax.random.PRNGKey(0), (K, D))
    cb2 = jax.random.normal(jax.random.PRNGKey(1), (K, D))

    def ssl(wav, lens=None):
        base = wav[..., None] * jnp.ones((D,))
        return jnp.stack([base, base + 1.0, base * 2.0])  # (3, B, T, D)

    decoded = {}

    def vocoder(toks):
        decoded["toks"] = toks
        return jnp.zeros((toks.shape[0], 1, 100))

    model = DiscreteSSL(ssl, {1: cb1, 2: cb2}, vocoder=vocoder)
    wav = jnp.ones((2, 10))
    toks, emb, proc = model.encode(wav)
    assert toks.shape == (2, 10, 2)
    assert emb.shape == (2, 10, 2, D)
    assert len(proc) == 2 and len(proc[0]) == 2

    # dedup collapses constant runs
    _, _, proc_d = model.encode(wav, SSL_layers=[1], deduplicates=[True])
    assert len(proc_d[0][0]) == 1

    model.decode(toks)
    # second layer offset by K
    assert int(decoded["toks"][0, 0, 1] - toks[0, 0, 1]) == K

    with pytest.raises(ValueError):
        model.encode(wav, SSL_layers=[99])


def test_l2i_nmf_pipeline():
    from speechbrain_tpu.lobes.models.L2I import (
        NMFDecoderAudio, NMFEncoder, Theta, Psi,
    )

    X = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 20, 30)))
    enc = NMFEncoder(n_freq=20, n_comp=5)
    v_e = enc.init(jax.random.PRNGKey(1), X)
    H = enc.apply(v_e, X)
    assert H.shape == (1, 5, 30)

    dec = NMFDecoderAudio(n_comp=5, n_freq=20)
    v_d = dec.init(jax.random.PRNGKey(2), H)
    Xhat = dec.apply(v_d, H)
    assert Xhat.shape == (1, 20, 30)
    assert float(Xhat.min()) >= 0.0  # nonnegative reconstruction

    theta = Theta(n_comp=5, T=30, num_classes=4)
    v_t = theta.init(jax.random.PRNGKey(3), H)
    c = theta.apply(v_t, H)
    assert c.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(c.sum(-1)), 1.0, rtol=1e-5)

    psi = Psi(n_comp=5, T=30, in_emb_dims=[12, 10, 8])
    inp = [jnp.ones((2, 6, 2, 12)), jnp.ones((2, 6, 2, 10)),
           jnp.ones((2, 12, 5, 8))]
    v_p = psi.init(jax.random.PRNGKey(4), inp)
    h = psi.apply(v_p, inp)
    assert h.shape == (2, 5, 30)


def test_piq_vq_partitioning():
    from speechbrain_tpu.lobes.models.PIQ import (
        Conv2dEncoder_v2, VectorQuantizedPSI_Audio, get_irrelevant_regions,
    )

    irr = get_irrelevant_regions(jnp.asarray([1, 0, 2]), 20, 3, 5)
    assert irr.shape == (3, 20)
    assert bool(irr[:, -5:].all())  # shared keys irrelevant in TRAIN
    irr_v = get_irrelevant_regions(
        jnp.asarray([1, 0, 2]), 20, 3, 5, stage="VALID"
    )
    assert not bool(irr_v[:, -5:].any())

    enc = Conv2dEncoder_v2(dim=16)
    x = jnp.ones((2, 32, 32))
    v = enc.init(jax.random.PRNGKey(0), x)
    h = enc.apply(v, x, mutable=["batch_stats"])[0]
    assert h.shape == (2, 2, 2, 16)

    psi = VectorQuantizedPSI_Audio(dim=16, K=32, numclasses=3,
                                   shared_keys=4)
    labels = jnp.asarray([0.0, 2.0])
    v_p = psi.init(jax.random.PRNGKey(1), h, labels)
    logspec, hcat, z_q = psi.apply(v_p, h, labels)
    assert logspec.shape[0] == 2 and logspec.shape[-1] == 1
    assert z_q.shape == hcat.shape


def test_beats_features_and_tagging():
    from speechbrain_tpu.lobes.models.beats import BEATs

    model = BEATs(input_patch_size=4, embed_dim=16, encoder_embed_dim=24,
                  encoder_layers=2, encoder_ffn_embed_dim=32,
                  encoder_attention_heads=4, num_buckets=16,
                  max_distance=32, conv_pos=8, conv_pos_groups=4)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 4000))
    lens = jnp.asarray([1.0, 0.5])
    v = model.init(jax.random.PRNGKey(1), wav, lens)
    feats = model.apply(v, wav, lens)
    assert feats.ndim == 3 and feats.shape[-1] == 24

    tagger = BEATs(input_patch_size=4, embed_dim=16, encoder_embed_dim=24,
                   encoder_layers=1, encoder_ffn_embed_dim=32,
                   encoder_attention_heads=4, num_buckets=16,
                   max_distance=32, predictor_class=7, conv_pos=8,
                   conv_pos_groups=4)
    v_t = tagger.init(jax.random.PRNGKey(2), wav, lens)
    probs = tagger.apply(v_t, wav, lens)
    assert probs.shape == (2, 7)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
