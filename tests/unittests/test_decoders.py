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


# ---------------------------------------------------------------------------
# Beam search exact parity vs brute-force enumeration
# ---------------------------------------------------------------------------

def _markov_table(vocab, seed=10):
    # seed 10: eos passes the 1.5x threshold after tokens 1/2 but not
    # after bos, so every finished hypothesis is non-empty
    """Fixed per-prev-token log-prob rows (a 1st-order Markov acoustic)."""
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((vocab, vocab)).astype(np.float32) * 2.0
    return jax.nn.log_softmax(jnp.asarray(logits), axis=-1)


def _brute_force_beam(table, eos, max_steps, eos_threshold):
    """Enumerate every hypothesis exactly with the searcher's semantics:
    raw-sum alive scores, eos gated by the eos-threshold, finished scores
    length-normalized by (step+1). Returns (best_tokens, best_score)."""
    table = np.asarray(table)
    vocab = table.shape[0]
    nonterm = [v for v in range(vocab) if v != eos]
    finished = []
    # prefixes: (tokens, raw_score, prev_token)
    frontier = [([], 0.0, eos)]  # bos == eos index here? no: prev starts at bos
    frontier = [([], 0.0, "bos")]
    for step in range(max_steps):
        nxt = []
        for tokens, score, prev in frontier:
            row = table[0] if prev == "bos" else table[prev]
            max_logp = row.max()
            eos_ok = row[eos] >= eos_threshold * max_logp
            if eos_ok:
                finished.append(
                    (tokens, (score + row[eos]) / (step + 1), step + 1)
                )
            for v in nonterm:
                nxt.append((tokens + [v], score + row[v], v))
        frontier = nxt
    best = max(finished, key=lambda f: f[1])
    return best[0], best[1]


def test_beam_search_exact_parity_with_brute_force():
    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    vocab, eos, max_steps = 3, 0, 4
    table = _markov_table(vocab)

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        logp = table[inp_tokens]
        attn = jnp.ones((inp_tokens.shape[0], enc_states.shape[1]))
        return logp, memory, attn

    def init_fn(batch_size, enc_states, enc_lens):
        return {"dummy": jnp.zeros((batch_size, 1))}

    searcher = S2SRNNBeamSearcher(
        step_fn=step_fn, init_fn=init_fn,
        bos_index=eos, eos_index=eos,
        min_decode_ratio=0.0, max_decode_ratio=1.0,
        beam_size=16,  # >= (vocab-1)**max_steps: search is exhaustive
        eos_threshold=1.5,
    )
    enc = jnp.zeros((2, max_steps, 4))
    hyps, lengths, scores, _ = searcher(enc, jnp.ones(2))

    ref_tokens, ref_score = _brute_force_beam(table, eos, max_steps, 1.5)
    assert hyps[0] == ref_tokens and hyps[1] == ref_tokens, (hyps, ref_tokens)
    np.testing.assert_allclose(scores, ref_score, rtol=1e-5)


def test_beam_search_max_attn_shift_blocks_jumpy_hypotheses():
    """With a forced attention peak jump > max_attn_shift after step 0,
    every continuation is blocked, so decoding ends at the earliest eos."""
    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    vocab, eos, T = 3, 0, 8
    # acoustics prefer token 1 forever (eos competitive but weaker)
    row = np.full((vocab,), -5.0, np.float32)
    row[1] = -0.1
    row[eos] = -0.3
    logp_row = jnp.asarray(jax.nn.log_softmax(jnp.asarray(row)))

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        n = inp_tokens.shape[0]
        logp = jnp.tile(logp_row[None], (n, 1))
        # attention peak teleports: step counter in memory moves peak by 5
        step = memory["step"]
        peak = (step * 5) % T
        attn = jax.nn.one_hot(jnp.full((n,), peak), T)
        return logp, {"step": step + 1}, attn

    def init_fn(batch_size, enc_states, enc_lens):
        return {"step": jnp.zeros((), jnp.int32)}

    common = dict(
        step_fn=step_fn, init_fn=init_fn, bos_index=eos, eos_index=eos,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=2,
        eos_threshold=10.0,  # eos never threshold-blocked (logp negative)
    )
    free = S2SRNNBeamSearcher(**common)
    enc = jnp.zeros((1, T, 4))
    hyps_free, _, _, _ = free(enc, jnp.ones(1))

    constrained = S2SRNNBeamSearcher(
        **common, using_max_attn_shift=True, max_attn_shift=2,
    )
    hyps_con, _, _, _ = constrained(enc, jnp.ones(1))
    # unconstrained keeps emitting 1s; constrained must stop earlier
    assert len(hyps_con[0]) < len(hyps_free[0]), (hyps_con, hyps_free)


# ---------------------------------------------------------------------------
# Rescoring (second pass) + dense n-gram fusion
# ---------------------------------------------------------------------------

def test_rescorer_builder_fixes_top1():
    """Acoustics slightly prefer [1, 1]; an LM strongly prefers [2, 1].
    With a heavy LM weight, rescoring must flip the n-best order."""
    from speechbrain_tpu.decoders.scorer import (
        RescorerBuilder,
        TransformerLMRescorer,
    )
    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    vocab, eos = 3, 0
    # per-step log-probs independent of history: token1 slightly > token2
    row = jax.nn.log_softmax(jnp.asarray([0.2, 2.0, 1.8]))

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        n = inp_tokens.shape[0]
        return jnp.tile(row[None], (n, 1)), memory, jnp.ones((n, 4))

    searcher = S2SRNNBeamSearcher(
        step_fn=step_fn,
        init_fn=lambda n, e, l: {"d": jnp.zeros((n, 1))},
        # min_decode_ratio blocks step-0 eos: with reference-exact
        # semantics an immediate eos would otherwise claim a finished
        # slot (even from a -inf tie) and crowd [2] out of the n-best
        bos_index=eos, eos_index=eos, min_decode_ratio=0.25,
        max_decode_ratio=0.5, beam_size=4, topk=4, return_topk=True,
        eos_threshold=100.0,
    )
    enc = jnp.zeros((2, 4, 4))
    hyps, _, _, (topk_hyps, topk_scores, _) = searcher(enc, jnp.ones(2))
    assert hyps[0][0] == 1  # acoustics alone pick token 1 first

    # transformer LM: after bos, token 2 is much more likely
    def lm_fn(tokens):
        N, L = tokens.shape
        logits = jnp.tile(
            jnp.asarray([0.0, -5.0, 5.0])[None, None], (N, L, 1)
        )
        return logits

    builder = RescorerBuilder(
        weights={"tlm": 10.0},
        rescorers={"tlm": TransformerLMRescorer(lm_fn, bos_index=eos,
                                                eos_index=eos)},
    )
    best_hyps, best_scores, (rr_hyps, rr_scores) = builder.rescore(
        topk_hyps, topk_scores
    )
    assert best_hyps[0][0] == 2, (best_hyps, rr_scores)
    assert rr_scores[0][0] >= rr_scores[0][-1]


def test_ngram_dense_scorer_in_loop():
    """A bigram LM that forbids repeating a token steers the beam."""
    from speechbrain_tpu.decoders.scorer import NgramDenseScorer, ScorerBuilder
    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    vocab, eos = 3, 0
    row = jax.nn.log_softmax(jnp.asarray([0.5, 2.0, 1.0]))

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        n = inp_tokens.shape[0]
        return jnp.tile(row[None], (n, 1)), memory, jnp.ones((n, 4))

    uni = np.zeros((vocab,), np.float32)
    bi = np.zeros((vocab, vocab), np.float32)
    np.fill_diagonal(bi, -20.0)  # repeating any token is terrible
    scorer = ScorerBuilder(
        weights={"ngram": 1.0},
        full_scorers={"ngram": NgramDenseScorer(uni, bi)},
    )
    searcher = S2SRNNBeamSearcher(
        step_fn=step_fn,
        init_fn=lambda n, e, l: {"d": jnp.zeros((n, 1))},
        bos_index=eos, eos_index=eos, min_decode_ratio=0.0,
        max_decode_ratio=0.75, beam_size=4, scorer=scorer,
        eos_threshold=100.0,
    )
    enc = jnp.zeros((1, 4, 4))
    hyps, _, _, _ = searcher(enc, jnp.ones(1))
    # without the LM the acoustics would emit 1,1,1; the bigram forbids
    # immediate repeats, so adjacent tokens must differ
    h = hyps[0]
    assert all(a != b for a, b in zip(h, h[1:])), h
