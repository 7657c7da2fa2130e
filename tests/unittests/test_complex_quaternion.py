"""Tests for complex/quaternion networks + unet + new lobes + new inference."""

import jax
import jax.numpy as jnp
import numpy as np

KEY = jax.random.PRNGKey(0)


def test_complex_algebra():
    from speechbrain_tpu.nnet.complex_networks.c_ops import complex_linear_op

    # (1+2i)(3+4i) = -5+10i
    out = complex_linear_op(
        jnp.asarray([[1.0, 2.0]]), jnp.asarray([[3.0]]), jnp.asarray([[4.0]])
    )
    assert np.allclose(np.asarray(out), [[-5.0, 10.0]])


def test_complex_layers():
    from speechbrain_tpu.nnet.complex_networks import (
        CBatchNorm, CConv1d, CLSTM, CLinear, CRNN,
    )

    x = jnp.ones((2, 8, 12))
    for mod, shape in [
        (CLinear(n_neurons=5), (2, 8, 10)),
        (CConv1d(out_channels=4, kernel_size=3), (2, 8, 8)),
        (CBatchNorm(), (2, 8, 12)),
    ]:
        p = mod.init(KEY, x)
        assert mod.apply(p, x).shape == shape
    for rnn in (CRNN(hidden_size=4), CLSTM(hidden_size=4)):
        p = rnn.init(KEY, x)
        out, _ = rnn.apply(p, x)
        assert out.shape == (2, 8, 8)


def test_quaternion_algebra():
    from speechbrain_tpu.nnet.quaternion_networks.q_ops import quaternion_linear_op

    # i * j = k
    x = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])
    z = jnp.zeros((1, 1)); o = jnp.ones((1, 1))
    out = quaternion_linear_op(x, z, z, o, z)
    assert np.allclose(np.asarray(out), [[0, 0, 0, 1.0]])
    # quaternion norm preserved by unit rotations: |q*w| = |q||w|
    import numpy.random as npr
    r = jnp.asarray([[0.5]]); i = jnp.asarray([[0.5]])
    j = jnp.asarray([[0.5]]); k = jnp.asarray([[0.5]])  # |w| = 1
    q = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = quaternion_linear_op(q, r, i, j, k)
    assert abs(float(jnp.linalg.norm(out)) - float(jnp.linalg.norm(q))) < 1e-5


def test_quaternion_layers():
    from speechbrain_tpu.nnet.quaternion_networks import (
        QBatchNorm, QConv1d, QLSTM, QLinear, QRNN,
    )

    x = jnp.ones((2, 6, 16))
    p = QLinear(n_neurons=4).init(KEY, x)
    assert QLinear(n_neurons=4).apply(p, x).shape == (2, 6, 16)
    conv = QConv1d(out_channels=4, kernel_size=3)
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 6, 16)
    bn = QBatchNorm()
    p = bn.init(KEY, x)
    assert bn.apply(p, x).shape == (2, 6, 16)
    for rnn in (QRNN(hidden_size=4), QLSTM(hidden_size=4)):
        p = rnn.init(KEY, x)
        out, _ = rnn.apply(p, x)
        assert out.shape == (2, 6, 16)


def test_unet():
    from speechbrain_tpu.nnet.unet import UNetModel

    net = UNetModel(in_channels=1, model_channels=8, out_channels=1,
                    num_res_blocks=1, attention_resolutions=(),
                    channel_mult=(1, 2))
    x = jnp.ones((1, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    v = net.init(KEY, x, t)
    assert net.apply(v, x, t).shape == (1, 16, 16, 1)


def test_resepformer_and_bsq():
    from speechbrain_tpu.lobes.models.resepformer import RESepformerWrapper
    from speechbrain_tpu.lobes.models.bsq import BSQ

    model = RESepformerWrapper(encoder_kernel_size=16,
                               encoder_out_nchannels=16,
                               masknet_chunksize=10, masknet_numspks=2,
                               d_ffn=32)
    x = jnp.ones((1, 800))
    v = model.init(KEY, x, train=False)
    assert model.apply(v, x, train=False).shape == (1, 800, 2)

    q = BSQ(dim=8)
    x = jax.random.normal(KEY, (2, 5, 16))
    p = q.init(KEY, x)
    out = q.apply(p, x)
    assert out["indices"].max() < 256


def test_codec_augment():
    from speechbrain_tpu.augment.codec import CodecAugment

    aug = CodecAugment(16000)
    x = jnp.asarray(np.sin(np.arange(1600) * 0.1)[None], jnp.float32)
    out = aug(x, rng=KEY)
    assert out.shape == x.shape


def test_qpooling2d():
    """QPooling2d parity semantics (ref q_pooling.py:1-125): avg pools
    each component; max keeps the WHOLE quaternion of largest magnitude
    per window (components stay together)."""
    from speechbrain_tpu.nnet.quaternion_networks import QPooling2d

    x = jax.random.normal(KEY, (10, 15, 12))
    pool = QPooling2d("max", (5, 3))
    out = pool.apply({}, x)
    assert out.shape == (10, 3, 4)

    # hand-checkable case: one quaternion per window position
    x = jnp.zeros((1, 2, 8))
    # window (2, 1) over each component (1, 2, 2): candidates are the
    # quaternions at t=0 and t=1 per feature column
    x = x.at[0, 0].set(jnp.asarray([1.0, 0, 3.0, 0, 0.0, 0, 1.0, 0]))
    x = x.at[0, 1].set(jnp.asarray([0.0, 2.0, -4.0, 1.0, 0.5, 0, 0.5, 0]))
    out = QPooling2d("max", (2, 1)).apply({}, x)
    assert out.shape == (1, 1, 8)
    # col0 quaternions: t0 = (1, 3, 0, 1) |.|^2 = 11;
    #                   t1 = (0, -4, 0.5, 0.5) |.|^2 = 16.5 -> t1 wins.
    # col1: t0 = 0; t1 = (2, 1, 0, 0) -> t1 wins. Both winners sit in
    # row t1, so the pooled row must equal x[0, 1] exactly.
    assert np.allclose(np.asarray(out[0, 0]), np.asarray(x[0, 1]))
    avg = QPooling2d("avg", (2, 1)).apply({}, x)
    assert avg.shape == (1, 1, 8)
    assert np.allclose(np.asarray(avg[0, 0, 0]), 0.5)  # mean of r column 0
