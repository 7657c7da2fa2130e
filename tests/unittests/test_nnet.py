"""Unit tests for nnet primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.nnet.CNN import Conv1d, Conv2d, ConvTranspose1d, DepthwiseSeparableConv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.losses import (
    AdditiveAngularMargin,
    LogSoftmaxWrapper,
    PitWrapper,
    cal_si_snr,
    classification_error,
    compute_length_mask,
    ctc_loss,
    get_si_snr_with_pitwrapper,
    kldiv_loss,
    l1_loss,
    mse_loss,
    nll_loss,
)
from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm, PCEN
from speechbrain_tpu.nnet.pooling import Pooling1d, StatisticsPooling
from speechbrain_tpu.nnet.schedulers import NewBobScheduler, NoamScheduler


KEY = jax.random.PRNGKey(0)


def test_linear():
    lin = Linear(n_neurons=32)
    x = jnp.ones((4, 10, 16))
    p = lin.init(KEY, x)
    assert lin.apply(p, x).shape == (4, 10, 32)


def test_conv1d_same_causal():
    x = jnp.ones((2, 50, 8))
    for padding in ("same", "causal"):
        conv = Conv1d(out_channels=16, kernel_size=5, padding=padding)
        p = conv.init(KEY, x)
        assert conv.apply(p, x).shape == (2, 50, 16)


def test_conv1d_causal_is_causal():
    """Output at time t must not depend on inputs after t."""
    conv = Conv1d(out_channels=4, kernel_size=3, padding="causal")
    x = jnp.zeros((1, 20, 2))
    p = conv.init(KEY, x)
    x2 = x.at[0, 10, :].set(1.0)
    y1 = conv.apply(p, x)
    y2 = conv.apply(p, x2)
    diff = np.abs(np.asarray(y1 - y2)).sum(axis=(0, 2))
    assert diff[:10].sum() == 0  # nothing before t=10 changed
    assert diff[10:].sum() > 0


def test_conv1d_stride():
    conv = Conv1d(out_channels=4, kernel_size=3, stride=2, padding="same")
    x = jnp.ones((2, 51, 8))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 26, 4)


def test_conv2d():
    conv = Conv2d(out_channels=8, kernel_size=(3, 3))
    x = jnp.ones((2, 20, 16, 1))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 20, 16, 8)


def test_conv_transpose():
    conv = ConvTranspose1d(out_channels=4, kernel_size=16, stride=8, padding=4)
    x = jnp.ones((2, 10, 8))
    p = conv.init(KEY, x)
    # torch formula: (10-1)*8 - 2*4 + 16 = 80
    assert conv.apply(p, x).shape == (2, 80, 4)


def test_depthwise_separable():
    conv = DepthwiseSeparableConv1d(out_channels=16, kernel_size=3)
    x = jnp.ones((2, 10, 8))
    p = conv.init(KEY, x)
    assert conv.apply(p, x).shape == (2, 10, 16)


def test_batchnorm_updates_stats():
    bn = BatchNorm1d()
    x = jax.random.normal(KEY, (8, 20, 4)) * 3 + 1
    vars_ = bn.init(KEY, x, train=False)
    out, new_vars = bn.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(new_vars["batch_stats"]["BatchNorm_0"]["mean"]), 0.0
    )
    assert abs(float(out.mean())) < 0.1  # normalized


def test_layernorm():
    ln = LayerNorm()
    x = jax.random.normal(KEY, (2, 5, 8)) * 4 + 2
    p = ln.init(KEY, x)
    out = ln.apply(p, x)
    assert abs(float(out.mean())) < 1e-5


def test_pcen():
    pcen = PCEN()
    x = jnp.abs(jax.random.normal(KEY, (2, 30, 10)))
    p = pcen.init(KEY, x)
    out = pcen.apply(p, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_statistics_pooling_masked():
    sp = StatisticsPooling()
    x = jnp.concatenate([jnp.ones((1, 5, 4)), 100 * jnp.ones((1, 5, 4))], axis=1)
    out_full = sp.apply({}, x)
    out_masked = sp.apply({}, x, lengths=jnp.array([0.5]))
    assert float(out_masked[0, 0, 0]) == pytest.approx(1.0)  # padding excluded
    assert float(out_full[0, 0, 0]) > 1.0


def test_pooling1d():
    pool = Pooling1d("max", 2)
    x = jnp.arange(8.0).reshape(1, 8, 1)
    out = pool.apply({}, x)
    assert out.shape == (1, 4, 1)
    assert float(out[0, 0, 0]) == 1.0


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------

def test_length_mask():
    data = jnp.ones((2, 4))
    mask = compute_length_mask(data, jnp.array([0.5, 1.0]))
    assert np.asarray(mask).tolist() == [[True, True, False, False], [True] * 4]


def test_nll_and_error():
    logp = jnp.log(jnp.asarray([[[0.9, 0.1]], [[0.1, 0.9]]]))
    targets = jnp.array([[0], [1]])
    assert float(nll_loss(logp, targets)) < 0.2
    assert float(classification_error(logp, targets)) == 0.0


def test_kldiv_label_smoothing():
    logp = jax.nn.log_softmax(jnp.zeros((2, 3, 5)))
    t = jnp.ones((2, 3), dtype=jnp.int32)
    loss = kldiv_loss(logp, t, label_smoothing=0.1)
    assert np.isfinite(float(loss))


def test_ctc_loss_decreases_with_matching_logits():
    """CTC loss should be lower for logits aligned with the target."""
    B, T, K = 1, 6, 4
    targets = jnp.array([[1, 2, 3]])
    good = jnp.full((B, T, K), -5.0)
    path = [1, 1, 2, 2, 3, 3]
    for t, c in enumerate(path):
        good = good.at[0, t, c].set(5.0)
    good = jax.nn.log_softmax(good)
    rand = jax.nn.log_softmax(jnp.zeros((B, T, K)))
    l_good = ctc_loss(good, targets, jnp.array([1.0]), jnp.array([1.0]), blank_index=0)
    l_rand = ctc_loss(rand, targets, jnp.array([1.0]), jnp.array([1.0]), blank_index=0)
    assert float(l_good) < float(l_rand)


def test_mse_l1_masked():
    p = jnp.ones((2, 4))
    t = jnp.zeros((2, 4))
    assert float(mse_loss(p, t)) == 1.0
    assert float(l1_loss(p, t, length=jnp.array([0.5, 0.5]))) == 1.0


def test_si_snr_perfect():
    x = jax.random.normal(KEY, (2, 1000, 2))
    snr = cal_si_snr(x, x)
    assert float(snr.min()) > 50.0


def test_pit_wrapper_finds_permutation():
    x = jax.random.normal(KEY, (3, 100, 2))
    swapped = x[..., ::-1]
    loss = get_si_snr_with_pitwrapper(x, swapped)
    assert float(loss.max()) < -50.0  # perfect after permutation


def test_aam_softmax():
    aam = AdditiveAngularMargin(margin=0.2, scale=30)
    wrapper = LogSoftmaxWrapper(aam)
    cos = jnp.asarray([[0.9, -0.5], [-0.5, 0.9]])
    loss = wrapper(cos, jnp.array([0, 1]))
    assert np.isfinite(float(loss))
    bad_loss = wrapper(cos, jnp.array([1, 0]))
    assert float(bad_loss) > float(loss)


# --------------------------------------------------------------------------
# schedulers
# --------------------------------------------------------------------------

def test_newbob():
    sch = NewBobScheduler(initial_value=1.0)
    sch(10.0)
    old, new = sch(11.0)  # worse
    assert new == 0.5


def test_newbob_ckpt(tmp_path):
    sch = NewBobScheduler(initial_value=1.0)
    sch(5.0)
    sch(6.0)
    p = tmp_path / "s.ckpt"
    sch._save(p)
    sch2 = NewBobScheduler(initial_value=1.0)
    sch2._load(p)
    assert sch2.hyperparam_value == sch.hyperparam_value


def test_noam_warmup():
    sch = NoamScheduler(lr_initial=1.0, n_warmup_steps=10)
    lrs = [sch(None)[1] for _ in range(20)]
    assert np.argmax(lrs) == 9  # peak at warmup end
    assert lrs[-1] < lrs[9]
    # optax-schedule style
    assert sch(5) == pytest.approx(lrs[4], rel=1e-6)


def test_update_learning_rate_group():
    """Group-targeted LR update reaches ONLY the named multi_transform
    branch (the two-optimizer fine-tuning pattern: SSL encoder at
    lr_wav2vec, head at lr)."""
    import jax.numpy as jnp
    import optax

    from speechbrain_tpu.nnet.schedulers import update_learning_rate

    params = {"extractor": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(2)}}
    opt = optax.multi_transform(
        {
            "ssl": optax.inject_hyperparams(optax.adam)(
                learning_rate=1e-4
            ),
            "main": optax.inject_hyperparams(optax.adam)(
                learning_rate=1e-2
            ),
        },
        lambda p: {k: ("ssl" if k == "extractor" else "main") for k in p},
    )
    state = opt.init(params)
    update_learning_rate(state, 5e-5, group="ssl")
    update_learning_rate(state, 5e-3, group="main")

    from speechbrain_tpu.nnet.schedulers import _find_group, _find_injected

    assert float(
        _find_injected(_find_group(state, "ssl")).hyperparams[
            "learning_rate"
        ]
    ) == pytest.approx(5e-5)
    assert float(
        _find_injected(_find_group(state, "main")).hyperparams[
            "learning_rate"
        ]
    ) == pytest.approx(5e-3)
    with pytest.raises(ValueError):
        update_learning_rate(state, 1e-3, group="nope")
