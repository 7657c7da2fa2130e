"""KV-cached incremental decoding must match the full-buffer decode
exactly: same tiny TransformerASR, same heads — the cached searchers
(S2SKVGreedySearcher/S2SKVBeamSearcher) and the buffer-based ones must
produce identical hypotheses (decoders/seq2seq.py; the O(L) serving
path for reference seq2seq.py:1853-style search)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechbrain_tpu.decoders.seq2seq import (
    S2SKVBeamSearcher,
    S2SKVGreedySearcher,
    S2STransformerBeamSearcher,
    S2STransformerGreedySearcher,
)
from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
    TransformerASR,
)
from speechbrain_tpu.nnet.linear import Linear

VOCAB, BOS, EOS = 12, 0, 0
MAX_LEN = 10


@pytest.fixture(scope="module")
def model_and_enc():
    net = TransformerASR(
        tgt_vocab=VOCAB, input_size=8, d_model=16, nhead=4,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=32,
    )
    rng = jax.random.PRNGKey(3)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 20, 8)), jnp.float32
    )
    tokens = jnp.zeros((2, 3), jnp.int32)
    v = net.init(rng, feats, tokens)
    head = Linear(n_neurons=VOCAB)
    enc = net.apply(v, feats, method="encode")
    dec0, _ = net.apply(v, tokens, enc, method="decode")
    v_head = head.init(rng, dec0)
    return net, v, head, v_head, enc


def _buffer_fns(net, v, head, v_head):
    def decode_fn(buf, enc_states, enc_lens):
        out, attn = net.apply(v, buf, enc_states, method="decode")
        logits = head.apply(v_head, out)
        return jax.nn.log_softmax(logits, axis=-1), attn

    return decode_fn


def _kv_fns(net, v, head, v_head):
    def decode_step_fn(tokens, cache, enc_states, enc_lens, step):
        out, new_cache, attn = net.apply(
            v, tokens, enc_states, cache, step, method="decode_step"
        )
        logits = head.apply(v_head, out)
        return jax.nn.log_softmax(logits, axis=-1), new_cache, attn

    def init_cache_fn(n, enc_states, enc_lens):
        return net.apply(v, n, MAX_LEN, method="init_decoder_cache")

    return decode_step_fn, init_cache_fn


def test_kv_greedy_matches_buffer_greedy(model_and_enc):
    net, v, head, v_head, enc = model_and_enc
    common = dict(bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
                  max_decode_ratio=0.4)
    buf = S2STransformerGreedySearcher(
        decode_fn=_buffer_fns(net, v, head, v_head), vocab_size=VOCAB,
        max_length=MAX_LEN, **common,
    )
    step_fn, init_fn = _kv_fns(net, v, head, v_head)
    kv = S2SKVGreedySearcher(step_fn, init_fn, **common)
    h1, _, s1, _ = buf(enc, jnp.ones(2))
    h2, _, s2, _ = kv(enc, jnp.ones(2))
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_kv_beam_matches_buffer_beam(model_and_enc):
    net, v, head, v_head, enc = model_and_enc
    common = dict(bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
                  max_decode_ratio=0.4, beam_size=4)
    buf = S2STransformerBeamSearcher(
        decode_fn=_buffer_fns(net, v, head, v_head), max_length=MAX_LEN,
        **common,
    )
    step_fn, init_fn = _kv_fns(net, v, head, v_head)
    kv = S2SKVBeamSearcher(step_fn, init_fn, **common)
    h1, l1, s1, _ = buf(enc, jnp.ones(2))
    h2, l2, s2, _ = kv(enc, jnp.ones(2))
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_precomputed_cross_kv_matches_plain_cache(model_and_enc):
    """decode_step over a cache with PRECOMPUTED cross-attention K/V
    must match the plain cache bit-for-bit (the serving path that skips
    re-projecting the static encoder memory every step)."""
    net, v, head, v_head, enc = model_and_enc
    B = enc.shape[0]
    plain = net.apply(v, B, MAX_LEN, method="init_decoder_cache")
    fused = net.apply(
        v, enc, MAX_LEN, method="init_decoder_cache_with_cross"
    )
    toks = jnp.asarray(np.random.default_rng(5).integers(0, VOCAB, (B,)),
                       jnp.int32)
    out_a, cache_a, _ = net.apply(
        v, toks, enc, plain, 0, method="decode_step"
    )
    out_b, cache_b, _ = net.apply(
        v, toks, enc, fused, 0, method="decode_step"
    )
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5
    )
    # a second step from the updated caches still agrees
    out_a2, _, _ = net.apply(v, toks, enc, cache_a, 1, method="decode_step")
    out_b2, _, _ = net.apply(v, toks, enc, cache_b, 1, method="decode_step")
    np.testing.assert_allclose(
        np.asarray(out_a2), np.asarray(out_b2), rtol=1e-5, atol=1e-5
    )


def test_shared_cross_kv_matches_replicated():
    """Beam-shared cross K/V (kv batch = utterances, query batch =
    utterances*beams) must give identical outputs to replicating the
    K/V per beam — the HBM saver behind full-config beam decoding."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.nnet.attention import MultiheadAttention

    B, K, T, D, H = 2, 3, 7, 16, 4
    mha = MultiheadAttention(nhead=H, d_model=D)
    rng = jax.random.PRNGKey(0)
    mem = jax.random.normal(rng, (B, T, D))
    q = jax.random.normal(jax.random.PRNGKey(1), (B * K, 1, D))
    q0 = jnp.zeros((B, 1, D))
    v = mha.init(rng, q0, mem, mem)
    kv = mha.apply(v, mem, mem, mem, return_kv_only=True)
    kv_rep = {k: jnp.repeat(x, K, axis=0) for k, x in kv.items()}
    lens = jnp.asarray([1.0, 5.0 / T])
    kpm = jnp.arange(T)[None, :] >= jnp.round(lens * T)[:, None]
    kpm_rep = jnp.repeat(kpm, K, axis=0)
    out_shared, w_shared = mha.apply(
        v, q, mem, mem, precomputed_kv=kv,
        key_padding_mask=kpm_rep,
    )
    mem_rep = jnp.repeat(mem, K, axis=0)
    out_rep, w_rep = mha.apply(
        v, q, mem_rep, mem_rep, precomputed_kv=kv_rep,
        key_padding_mask=kpm_rep,
    )
    assert jnp.allclose(out_shared, out_rep, atol=1e-5)
    assert jnp.allclose(w_shared, w_rep, atol=1e-5)


def test_ancestry_beam_matches_permuted_beam(model_and_enc):
    """Ancestry beam decoding (cache rows never move; the fused
    selection in ops/beam_attention.py replaces the per-step cache
    permute) must produce the same hypotheses and scores as the
    standard permuted-cache KV searcher."""
    net, v, head, v_head, enc = model_and_enc
    common = dict(bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
                  max_decode_ratio=0.4, beam_size=4)
    step_fn, init_fn = _kv_fns(net, v, head, v_head)
    kv = S2SKVBeamSearcher(step_fn, init_fn, **common)

    def anc_step_fn(tokens, cache, enc_states, enc_lens, step, anc):
        out, new_cache, attn = net.apply(
            v, tokens, enc_states, cache, step, anc=anc,
            method="decode_step",
        )
        logits = head.apply(v_head, out)
        return jax.nn.log_softmax(logits, axis=-1), new_cache, attn

    anc_kv = S2SKVBeamSearcher(anc_step_fn, init_fn, ancestry_kv=True,
                               **common)
    h1, l1, s1, _ = kv(enc, jnp.ones(2))
    h2, l2, s2, _ = anc_kv(enc, jnp.ones(2))
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_ancestry_beam_with_shared_cross(model_and_enc):
    """Ancestry mode composes with beam-shared precomputed cross K/V."""
    net, v, head, v_head, enc = model_and_enc
    common = dict(bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
                  max_decode_ratio=0.4, beam_size=4)
    step_fn, init_fn = _kv_fns(net, v, head, v_head)
    kv = S2SKVBeamSearcher(step_fn, init_fn, **common)

    def anc_step_fn(tokens, cache, enc_states, enc_lens, step, anc):
        out, new_cache, attn = net.apply(
            v, tokens, enc_states, cache, step, anc=anc,
            method="decode_step",
        )
        logits = head.apply(v_head, out)
        return jax.nn.log_softmax(logits, axis=-1), new_cache, attn

    anc_kv = S2SKVBeamSearcher(
        anc_step_fn,
        lambda n, e, l: net.apply(
            v, e, MAX_LEN, n, method="init_decoder_cache_with_cross"
        ),
        ancestry_kv=True, shared_cross_kv=True, **common,
    )
    h1, _, s1, _ = kv(enc, jnp.ones(2))
    h2, _, s2, _ = anc_kv(enc, jnp.ones(2))
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)
