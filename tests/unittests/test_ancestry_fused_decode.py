"""Full joint-decoding stack under ancestry beam decoding must match the
permuted-cache path token for token: KV decoder + KV TransformerLM
shallow fusion + CTC prefix scorer (the north-star serving
configuration; ops/beam_attention.py + decoders/seq2seq.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechbrain_tpu.decoders.scorer import (
    CTCScorer,
    KVTransformerLMScorer,
    ScorerBuilder,
)
from speechbrain_tpu.decoders.seq2seq import S2SKVBeamSearcher
from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
    TransformerASR,
)
from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
    TransformerLM,
)
from speechbrain_tpu.nnet.linear import Linear

V, D = 24, 16
B, T = 2, 12


@pytest.fixture(scope="module")
def stack():
    rng = jax.random.PRNGKey(0)
    net = TransformerASR(
        tgt_vocab=V, input_size=8, d_model=D, nhead=4,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=32,
        encoder_module="transformer", attention_type="regularMHA",
        normalize_before=True,
    )
    lm = TransformerLM(
        vocab=V, d_model=D, nhead=4, num_encoder_layers=2, d_ffn=32,
        dropout=0.0, activation="gelu", normalize_before=False,
    )
    seq_lin = Linear(n_neurons=V)
    ctc_lin = Linear(n_neurons=V)
    src = jax.random.normal(rng, (B, T, 8))
    tok0 = jnp.zeros((B, 3), jnp.int32)
    v = net.init(rng, src, tok0)
    enc = net.apply(v, src, method="encode")
    v_ctc = ctc_lin.init(rng, enc)
    dec0, _ = net.apply(v, tok0, enc, method="decode")
    v_seq = seq_lin.init(rng, dec0)
    v_lm = lm.init(rng, tok0)
    return net, lm, seq_lin, ctc_lin, v, v_lm, v_seq, v_ctc, enc


def _searcher(stack, ancestry):
    net, lm, seq_lin, ctc_lin, v, v_lm, v_seq, v_ctc, enc = stack
    max_steps = enc.shape[1]

    def decode_step_fn(toks, cache, enc_states, enc_lens, step, anc=None):
        out, nc, attn = net.apply(
            v, toks, enc_states, cache, step, anc=anc, method="decode_step"
        )
        return jax.nn.log_softmax(seq_lin.apply(v_seq, out), -1), nc, attn

    scorer = ScorerBuilder(
        weights={"ctc": 0.4, "transformerlm": 0.6},
        full_scorers={
            "transformerlm": KVTransformerLMScorer(
                step_fn=lambda t, c, s, a=None: lm.apply(
                    v_lm, t, c, s, anc=a, method="score_step"
                ),
                init_cache_fn=lambda n, L: lm.apply(
                    v_lm, n, L, method="init_cache"
                ),
                max_length=max_steps + 1,
                ancestry=ancestry,
            )
        },
        partial_scorers={
            "ctc": CTCScorer(
                ctc_fn=lambda e: jax.nn.log_softmax(
                    ctc_lin.apply(v_ctc, e), -1
                ),
                blank_index=0, eos_index=2,
            )
        },
    )
    return S2SKVBeamSearcher(
        decode_step_fn,
        lambda n, e, l: net.apply(
            v, e, max_steps + 1, n, method="init_decoder_cache_with_cross"
        ),
        shared_cross_kv=True, ancestry_kv=ancestry,
        bos_index=1, eos_index=2, min_decode_ratio=0.0,
        max_decode_ratio=1.0, beam_size=5, using_eos_threshold=False,
        length_normalization=True, scorer=scorer,
    )


def test_ancestry_fused_stack_matches_permuted(stack):
    enc = stack[-1]
    lens = jnp.ones((B,))
    h1, l1, s1, _ = _searcher(stack, ancestry=False)(enc, lens)
    h2, l2, s2, _ = _searcher(stack, ancestry=True)(enc, lens)
    assert h1 == h2, (h1, h2)
    np.testing.assert_allclose(s1, s2, atol=1e-4)
