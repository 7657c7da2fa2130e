"""KV-cached TransformerLM scoring: score_step must reproduce the full
causal forward position-for-position, and beam search fused with the
KV-cached scorer must produce the same hypotheses as the buffer-based
TransformerLMScorer (reference decoders/scorer.py:413 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.decoders.scorer import (
    KVTransformerLMScorer,
    ScorerBuilder,
    TransformerLMScorer,
)
from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearcher
from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
    TransformerLM,
)


def _tiny_lm(vocab=23):
    lm = TransformerLM(
        vocab=vocab, d_model=16, nhead=4, num_encoder_layers=2, d_ffn=32
    )
    x0 = jnp.ones((2, 5), jnp.int32)
    v = lm.init(jax.random.PRNGKey(1), x0)
    return lm, v


def test_score_step_matches_full_forward():
    lm, v = _tiny_lm()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 23, (3, 7)), jnp.int32)
    full = lm.apply(v, x)  # (3, 7, V)
    cache = lm.apply(v, 3, 12, method="init_cache")
    for step in range(7):
        logits, cache = lm.apply(
            v, x[:, step], cache, step, method="score_step"
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, step]),
            rtol=1e-4, atol=1e-4,
        )


def test_kv_lm_fused_beam_matches_buffer_lm_fused_beam():
    vocab = 23
    lm, v_lm = _tiny_lm(vocab)
    rng = np.random.default_rng(2)
    # a fixed fake acoustic decode_fn: per-position logits from a table
    table = jnp.asarray(rng.standard_normal((vocab, vocab)), jnp.float32)

    def decode_fn(buf, enc_states, enc_lens):
        logp = jax.nn.log_softmax(table[buf], axis=-1)
        return logp, jnp.ones((buf.shape[0], enc_states.shape[1]))

    def make_searcher(scorer):
        return S2STransformerBeamSearcher(
            decode_fn=decode_fn, max_length=16, bos_index=1, eos_index=2,
            min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=3,
            scorer=scorer,
        )

    enc = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    lens = jnp.ones((2,))

    buf_scorer = ScorerBuilder(
        weights={"lm": 0.5},
        full_scorers={
            "lm": TransformerLMScorer(
                lm_fn=lambda buf: lm.apply(v_lm, buf),
                bos_index=1, max_length=16, eos_index=2,
            )
        },
    )
    kv_scorer = ScorerBuilder(
        weights={"lm": 0.5},
        full_scorers={
            "lm": KVTransformerLMScorer(
                step_fn=lambda t, c, s: lm.apply(
                    v_lm, t, c, s, method="score_step"
                ),
                init_cache_fn=lambda n, L: lm.apply(
                    v_lm, n, L, method="init_cache"
                ),
                max_length=16,
            )
        },
    )
    hyps_buf, _, scores_buf, _ = make_searcher(buf_scorer)(enc, lens)
    hyps_kv, _, scores_kv, _ = make_searcher(kv_scorer)(enc, lens)
    assert hyps_buf == hyps_kv
    np.testing.assert_allclose(scores_buf, scores_kv, rtol=1e-4, atol=1e-4)
