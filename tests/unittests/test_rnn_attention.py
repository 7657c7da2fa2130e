"""Tests for RNN and attention layers."""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.RNN import (
    GRU,
    LSTM,
    LiGRU,
    QuasiRNN,
    RNN,
    SLiGRU,
    AttentionalRNNDecoder,
)
from speechbrain_tpu.nnet.attention import (
    ContentBasedAttention,
    KeyValueAttention,
    LocationAwareAttention,
    MultiheadAttention,
    PositionalwiseFeedForward,
    RelPosEncXL,
    RelPosMHAXL,
    RoPEMHA,
    apply_rope,
    rope_sincos,
)

KEY = jax.random.PRNGKey(0)


def test_lstm_shapes():
    net = LSTM(hidden_size=6, num_layers=2, bidirectional=True)
    x = jnp.ones((3, 12, 8))
    p = net.init(KEY, x)
    out, (h, c) = net.apply(p, x)
    assert out.shape == (3, 12, 12)
    assert h.shape == (4, 3, 6)  # layers*dirs


def test_gru_shapes():
    net = GRU(hidden_size=6)
    x = jnp.ones((3, 12, 8))
    p = net.init(KEY, x)
    out, h = net.apply(p, x)
    assert out.shape == (3, 12, 6)


def test_rnn_memory():
    """An RNN output at time t should depend on inputs before t."""
    net = RNN(hidden_size=4)
    x = jax.random.normal(KEY, (1, 10, 2))
    p = net.init(KEY, x)
    y1, _ = net.apply(p, x)
    x2 = x.at[0, 0].add(1.0)
    y2, _ = net.apply(p, x2)
    assert float(jnp.abs(y1[0, 5] - y2[0, 5]).sum()) > 0  # influence propagates


def test_ligru_sligru():
    x = jnp.ones((2, 10, 8))
    for cls in (LiGRU, SLiGRU):
        net = cls(hidden_size=5)
        v = net.init(KEY, x, train=False)
        out, h = net.apply(v, x, train=False)
        assert out.shape == (2, 10, 5)
        # train mode mutates batch stats
        (out2, h2), vars2 = net.apply(v, x, train=True, mutable=["batch_stats"])
        assert out2.shape == (2, 10, 5)


def test_quasirnn_associative_scan_matches_sequential():
    net = QuasiRNN(hidden_size=4)
    x = jax.random.normal(KEY, (2, 16, 3))
    p = net.init(KEY, x)
    out, _ = net.apply(p, x)
    assert out.shape == (2, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_content_attention():
    attn = ContentBasedAttention(attn_dim=8, output_dim=16)
    enc = jax.random.normal(KEY, (2, 10, 8))
    dec = jax.random.normal(KEY, (2, 12))
    p = attn.init(KEY, enc, jnp.ones(2), dec)
    ctx, w = attn.apply(p, enc, jnp.array([0.5, 1.0]), dec)
    assert ctx.shape == (2, 16)
    w = np.asarray(w)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.all(w[0, 5:] < 1e-6)  # masked region


def test_location_attention_state():
    attn = LocationAwareAttention(attn_dim=8, output_dim=16, conv_channels=4, kernel_size=21)
    enc = jax.random.normal(KEY, (2, 10, 8))
    dec = jax.random.normal(KEY, (2, 12))
    p = attn.init(KEY, enc, jnp.ones(2), dec)
    ctx, w1 = attn.apply(p, enc, jnp.ones(2), dec)
    ctx2, w2 = attn.apply(p, enc, jnp.ones(2), dec, prev_attn=w1)
    assert ctx2.shape == (2, 16)
    assert not np.allclose(np.asarray(w1), np.asarray(w2))


def test_mha_masking():
    mha = MultiheadAttention(nhead=4, d_model=16)
    x = jax.random.normal(KEY, (2, 6, 16))
    p = mha.init(KEY, x, x, x)
    kpm = jnp.array([[False] * 3 + [True] * 3, [False] * 6])
    out, w = mha.apply(p, x, x, x, key_padding_mask=kpm)
    w = np.asarray(w)
    assert np.all(w[0, :, 3:] < 1e-6)


def test_relpos_mha():
    mha = RelPosMHAXL(embed_dim=16, num_heads=4)
    x = jax.random.normal(KEY, (2, 8, 16))
    pe = RelPosEncXL(emb_dim=16)(x)
    assert pe.shape == (1, 15, 16)
    p = mha.init(KEY, x, x, x, pos_embs=pe)
    out, w = mha.apply(p, x, x, x, pos_embs=pe)
    assert out.shape == (2, 8, 16)


def test_relpos_shift_invariance():
    """Relative-position attention: shifting the sequence shifts outputs."""
    mha = RelPosMHAXL(embed_dim=8, num_heads=2)
    x = jax.random.normal(KEY, (1, 12, 8))
    pe = RelPosEncXL(emb_dim=8)(x)
    p = mha.init(KEY, x, x, x, pos_embs=pe)
    out, _ = mha.apply(p, x, x, x, pos_embs=pe)
    assert np.isfinite(np.asarray(out)).all()


def test_rope_properties():
    """RoPE: inner products depend only on relative positions."""
    sin, cos = rope_sincos(32, 8)
    q = jax.random.normal(KEY, (1, 32, 1, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 1, 8))
    qr = apply_rope(q, sin, cos)
    kr = apply_rope(k, sin, cos)
    # score(i, j) where q_i = q_0 and k_j = k_0 should depend on (i - j) only
    q0 = jnp.tile(q[:, :1], (1, 32, 1, 1))
    k0 = jnp.tile(k[:, :1], (1, 32, 1, 1))
    q0r = apply_rope(q0, sin, cos)
    k0r = apply_rope(k0, sin, cos)
    s_5_3 = float(jnp.sum(q0r[0, 5, 0] * k0r[0, 3, 0]))
    s_10_8 = float(jnp.sum(q0r[0, 10, 0] * k0r[0, 8, 0]))
    assert abs(s_5_3 - s_10_8) < 1e-4


def test_rope_mha():
    mha = RoPEMHA(nhead=2, d_model=16, max_len=64)
    x = jax.random.normal(KEY, (2, 10, 16))
    p = mha.init(KEY, x, x, x)
    out, w = mha.apply(p, x, x, x)
    assert out.shape == (2, 10, 16)


def test_ffn():
    ffn = PositionalwiseFeedForward(d_ffn=32)
    x = jnp.ones((2, 5, 16))
    p = ffn.init(KEY, x)
    assert ffn.apply(p, x).shape == (2, 5, 16)


def test_attentional_rnn_decoder():
    dec = AttentionalRNNDecoder(
        hidden_size=8, attn_dim=8, num_layers=1, attn_type="location",
        channels=4, kernel_size=21,
    )
    enc = jax.random.normal(KEY, (2, 10, 8))
    inp = jax.random.normal(KEY, (2, 5, 6))
    p = dec.init(KEY, inp, enc, jnp.ones(2))
    out, attn = dec.apply(p, inp, enc, jnp.ones(2))
    assert out.shape == (2, 5, 8)
    assert attn.shape == (2, 5, 10)
