"""Tests for decoders: CTC greedy/beam, seq2seq greedy/beam, scorers."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.decoders.ctc import (
    CTCBeamSearcher,
    CTCPrefixScore,
    ctc_greedy_decode,
    filter_ctc_output,
)
from speechbrain_tpu.decoders.scorer import RNNLMScorer, ScorerBuilder
from speechbrain_tpu.decoders.seq2seq import (
    S2SBeamSearcher,
    S2SGreedySearcher,
    S2STransformerBeamSearcher,
    S2STransformerGreedySearcher,
)

KEY = jax.random.PRNGKey(0)


def test_filter_ctc():
    assert filter_ctc_output([0, 0, 1, 1, 0, 2], blank_id=0) == [1, 2]


def test_ctc_greedy_decode():
    probs = jnp.asarray(
        [[[0.1, 0.8, 0.1], [0.1, 0.8, 0.1], [0.8, 0.1, 0.1], [0.1, 0.1, 0.8]]]
    )
    out = ctc_greedy_decode(probs, jnp.asarray([1.0]), blank_id=0)
    assert out == [[1, 2]]


def test_ctc_beam_search_simple():
    lp = np.log(
        np.asarray(
            [[[0.05, 0.05, 0.9], [0.05, 0.9, 0.05], [0.9, 0.05, 0.05]]]
        )
    )
    searcher = CTCBeamSearcher(blank_index=0, beam_size=8)
    beams = searcher(lp)[0]
    assert beams[0].text == (2, 1)


def _brute_force_ctc_prob(log_probs, seq, blank):
    """P(seq | x) by enumerating all alignment paths."""
    T, V = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        collapsed = [
            v for i, v in enumerate(path) if (i == 0 or v != path[i - 1])
        ]
        collapsed = [v for v in collapsed if v != blank]
        if collapsed == list(seq):
            total = np.logaddexp(total, sum(log_probs[t, path[t]] for t in range(T)))
    return total


def test_ctc_prefix_score_eos_matches_full_prob():
    """The eos candidate's cumulative score must equal log P_ctc(g|x)."""
    rng = np.random.default_rng(0)
    T, V = 4, 4  # tokens: 0=blank, 1..2 letters, 3=eos
    blank, eos = 0, 3
    x = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((1, T, V))), axis=-1)
    scorer = CTCPrefixScore(x, jnp.ones(1), blank_index=blank, eos_index=eos)
    state = scorer.init_state(1)

    # score extensions of the empty prefix with token 1
    cands = jnp.asarray([[1, 2, eos]])
    scores0, new_states = scorer.forward_step(
        jnp.asarray([True]), jnp.asarray([-1]), cands, state
    )
    # select candidate "1"
    state1 = scorer.select_state(new_states, jnp.asarray([0]), jnp.asarray([0]))
    # now score eos after prefix [1]
    scores1, _ = scorer.forward_step(
        jnp.asarray([False]), jnp.asarray([1]), cands, state1
    )
    # cumulative score of [1, eos] = psi_prev(g=[1]) + score(eos)
    total_1_eos = float(state1["psi_prev"][0] + scores1[0, 2])
    ref = _brute_force_ctc_prob(np.asarray(x[0]), [1], blank)
    assert abs(total_1_eos - ref) < 1e-3, (total_1_eos, ref)


def test_ctc_prefix_score_two_tokens():
    rng = np.random.default_rng(1)
    T, V = 5, 4
    blank, eos = 0, 3
    x = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((1, T, V))), axis=-1)
    scorer = CTCPrefixScore(x, jnp.ones(1), blank_index=blank, eos_index=eos)
    state = scorer.init_state(1)
    cands = jnp.asarray([[1, 2, eos]])
    s0, ns0 = scorer.forward_step(
        jnp.asarray([True]), jnp.asarray([-1]), cands, state
    )
    state1 = scorer.select_state(ns0, jnp.asarray([0]), jnp.asarray([0]))  # g=[1]
    s1, ns1 = scorer.forward_step(
        jnp.asarray([False]), jnp.asarray([1]), cands, state1
    )
    state12 = scorer.select_state(ns1, jnp.asarray([0]), jnp.asarray([1]))  # g=[1,2]
    s2, _ = scorer.forward_step(
        jnp.asarray([False]), jnp.asarray([2]), cands, state12
    )
    total = float(state12["psi_prev"][0] + s2[0, 2])
    ref = _brute_force_ctc_prob(np.asarray(x[0]), [1, 2], blank)
    assert abs(total - ref) < 1e-3, (total, ref)


# ---------------------------------------------------------------------------
# seq2seq search on a toy "oracle" decoder
# ---------------------------------------------------------------------------

VOCAB = 6
EOS = 0
BOS = 0
TARGET = [3, 4, 5]


def oracle_decode_fn(buf, enc_states, enc_lens):
    """Log-probs that deterministically favor TARGET then eos, for every
    position. Shape contract matches TransformerASR.decode + seq_lin."""
    N, L = buf.shape
    logits = np.full((L, VOCAB), -10.0, np.float32)
    for pos in range(L):
        want = TARGET[pos] if pos < len(TARGET) else EOS
        logits[pos, want] = 5.0
    logits = jnp.asarray(logits)[None].repeat(N, axis=0)
    return jax.nn.log_softmax(logits, axis=-1), None


def test_transformer_greedy_search():
    searcher = S2STransformerGreedySearcher(
        decode_fn=oracle_decode_fn,
        vocab_size=VOCAB,
        max_length=8,
        bos_index=BOS,
        eos_index=EOS,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
    )
    enc = jnp.zeros((2, 8, 4))
    hyps, lengths, scores, logp = searcher(enc, jnp.ones(2))
    assert hyps == [TARGET, TARGET]


def test_transformer_beam_search_matches_oracle():
    searcher = S2STransformerBeamSearcher(
        decode_fn=oracle_decode_fn,
        max_length=8,
        bos_index=BOS,
        eos_index=EOS,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        beam_size=4,
    )
    enc = jnp.zeros((2, 8, 4))
    hyps, lengths, scores, _ = searcher(enc, jnp.ones(2))
    assert hyps == [TARGET, TARGET]
    assert (lengths == 3).all()


def test_beam_search_topk():
    searcher = S2STransformerBeamSearcher(
        decode_fn=oracle_decode_fn,
        max_length=8,
        bos_index=BOS,
        eos_index=EOS,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        beam_size=4,
        topk=3,
        return_topk=True,
    )
    enc = jnp.zeros((1, 8, 4))
    hyps, lengths, scores, topk = searcher(enc, jnp.ones(1))
    topk_hyps, topk_scores, _ = topk
    assert topk_hyps[0][0] == TARGET
    assert len(topk_hyps[0]) == 3
    assert topk_scores[0][0] >= topk_scores[0][1]


def test_beam_search_with_lm_scorer():
    """An LM that strongly prefers token 2 after bos shifts the beam away
    from the acoustic oracle when weighted heavily."""

    def lm_fn(tokens, state):
        N = tokens.shape[0]
        logits = np.full((VOCAB,), -5.0, np.float32)
        logits[2] = 8.0
        out = jnp.asarray(logits)[None, None].repeat(N, axis=0)
        return out, state

    scorer = ScorerBuilder(
        weights={"rnnlm": 5.0},
        full_scorers={"rnnlm": RNNLMScorer(lm_fn, lambda n: jnp.zeros((n, 1)))},
    )
    searcher = S2STransformerBeamSearcher(
        decode_fn=oracle_decode_fn,
        max_length=8,
        bos_index=BOS,
        eos_index=EOS,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        beam_size=4,
        scorer=scorer,
    )
    enc = jnp.zeros((1, 8, 4))
    hyps, _, _, _ = searcher(enc, jnp.ones(1))
    assert hyps[0][0] == 2  # LM dominated the first step
