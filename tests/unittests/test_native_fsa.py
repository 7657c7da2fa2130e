"""Native FSA lattice decoding + LF-MMI verified against brute-force
path enumeration (the contract of the reference's k2-backed
lattice_decoder.py:453 one-best and losses.py:134 MMI)."""

import itertools
import os

import numpy as np
import pytest

from speechbrain_tpu.integrations.k2_fsa.fsa import (
    ctc_topo,
    intersect_forward,
    intersect_viterbi,
    linear_fsa,
    compose,
    remove_eps_input,
)
from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
    OneBestDecoder,
)
from speechbrain_tpu.integrations.k2_fsa.lexicon import Lexicon
from speechbrain_tpu.integrations.k2_fsa.losses import MmiGraphs, mmi_loss
from speechbrain_tpu.integrations.k2_fsa.prepare_lang import prepare_lang


def _collapse(path, blank=0):
    """CTC collapse of an emission path."""
    out = []
    prev = None
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return out


def _lang(tmp_path):
    d = tmp_path / "lang"
    d.mkdir()
    (d / "lexicon.txt").write_text("ab a b\nba b a\naa a a\n")
    prepare_lang(str(d))
    return Lexicon(str(d))


def test_ctc_linear_forward_matches_brute_force():
    """Sum over all emission paths collapsing to the target == the
    dense forward intersection of topo ∘ linear(target)."""
    rng = np.random.default_rng(0)
    V, T = 3, 4  # blank + 2 tokens
    logits = rng.standard_normal((T, V))
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    target = [1, 2]
    graph = remove_eps_input(
        compose(ctc_topo(V - 1), linear_fsa(target)), semiring="log"
    )
    got = float(intersect_forward(np.asarray(logp, np.float32), T, graph))
    acc = []
    for path in itertools.product(range(V), repeat=T):
        if _collapse(path) == target:
            acc.append(sum(logp[t, p] for t, p in enumerate(path)))
    want = np.logaddexp.reduce(acc)
    assert got == pytest.approx(float(want), abs=1e-4)


def test_hlg_one_best_matches_brute_force(tmp_path):
    """Viterbi over the compiled HLG == best word sequence found by
    enumerating every emission path and scoring its collapsed word
    decomposition."""
    lex = _lang(tmp_path)
    toks = lex.tokens  # ids for 'a' and 'b'
    V, T = len(toks) + 1, 5
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((T, V)) * 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    decoder = OneBestDecoder(lex)
    got = decoder.decode(np.asarray(logp, np.float32)[None])[0]

    # brute force: per emission path, collapse and segment into words
    tok_of_emit = {i + 1: t for i, t in enumerate(toks)}

    def words_of(seq):
        # all segmentations of the token sequence into lexicon words
        if not seq:
            return [[]]
        res = []
        for w, pr in lex.word2tokenids.items():
            pron = pr[0]
            if seq[: len(pron)] == pron:
                for rest in words_of(seq[len(pron):]):
                    res.append([w] + rest)
        return res

    best_score, best_words = -np.inf, None
    for path in itertools.product(range(V), repeat=T):
        seq = [tok_of_emit[p] for p in _collapse(path)]
        # the HLG accepts the empty (all-blank) sequence too: its start
        # state is final, exactly like a k2-composed graph
        cands = words_of(seq) if seq else [[]]
        if not cands:
            continue
        sc = sum(logp[t, p] for t, p in enumerate(path))
        if sc > best_score:
            best_score, best_words = sc, cands[0]
    assert got == best_words


def test_mmi_loss_matches_brute_force_and_is_differentiable(tmp_path):
    import jax
    import jax.numpy as jnp

    lex = _lang(tmp_path)
    toks = lex.tokens
    V, T = len(toks) + 1, 4
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((1, T, V)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    graphs = MmiGraphs(lex)
    loss = mmi_loss(logp, jnp.ones((1,)), graphs, ["ab"])

    # brute-force numerator and denominator
    tok_of_emit = {i + 1: t for i, t in enumerate(toks)}
    target = lex.texts_to_token_ids(["ab"])[0]

    def words_of(seq):
        if not seq:
            return True
        for w, pr in lex.word2tokenids.items():
            pron = pr[0]
            if seq[: len(pron)] == pron and words_of(seq[len(pron):]):
                return True
        return False

    lp = np.asarray(logp[0])
    num_acc, den_acc = [], []
    for path in itertools.product(range(V), repeat=T):
        sc = sum(lp[t, p] for t, p in enumerate(path))
        seq = [tok_of_emit[p] for p in _collapse(path)]
        if seq == target:
            num_acc.append(sc)
        if not seq or words_of(seq):  # empty path is in the graph too
            den_acc.append(sc)
    want = -(np.logaddexp.reduce(num_acc) - np.logaddexp.reduce(den_acc))
    assert float(loss) == pytest.approx(float(want), abs=1e-4)

    # gradients flow into the posteriors
    g = jax.grad(
        lambda x: mmi_loss(x, jnp.ones((1,)), graphs, ["ab"])
    )(logp)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------------
# k-best / batched / rescoring decoding (round-4 extensions)
# ---------------------------------------------------------------------------

def _enumerate_paths(fsa, logp, T):
    """DFS-enumerate EVERY length-T path through the eps-free graph:
    returns [(score, olabels)] including final weights."""
    from speechbrain_tpu.integrations.k2_fsa.fsa import EPS, NEG_INF

    arcs_from = {}
    for idx, (s, d, i, o) in enumerate(fsa.arcs):
        arcs_from.setdefault(int(s), []).append(
            (int(d), int(i), int(o), float(fsa.weights[idx]))
        )
    results = []

    def walk(state, t, score, olabels):
        if t == T:
            fw = float(fsa.final[state])
            if fw > NEG_INF / 2:
                results.append((score + fw, list(olabels)))
            return
        for d, i, o, w in arcs_from.get(state, ()):
            olabels.append(o)
            walk(d, t + 1, score + w + float(logp[t, i]), olabels)
            olabels.pop()

    walk(0, 0, 0.0, [])
    return results


def test_kbest_matches_brute_force_enumeration(tmp_path):
    from speechbrain_tpu.integrations.k2_fsa.fsa import EPS, intersect_kbest
    from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
        compile_HLG,
    )

    lex = _lang(tmp_path)
    graph, _ = compile_HLG(lex, semiring="max")
    rng = np.random.default_rng(3)
    T, V = 4, 1 + len(lex.tokens)
    logp = np.log(
        rng.dirichlet(np.ones(V), size=T).astype(np.float32)
    )
    K = 5
    got = intersect_kbest(logp, T, graph, K)
    want = _enumerate_paths(graph, logp, T)
    want_scores = sorted((s for s, _ in want), reverse=True)[:K]
    got_scores = [s for s, _ in got]
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4,
                               atol=1e-4)
    # the best path's output labels must match the enumeration's best
    best = max(want, key=lambda x: x[0])
    assert got[0][1] == [o for o in best[1] if o != EPS]


def test_batched_one_best_matches_per_utterance(tmp_path):
    from speechbrain_tpu.integrations.k2_fsa.fsa import intersect_viterbi
    from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
        OneBestDecoder,
    )

    lex = _lang(tmp_path)
    dec = OneBestDecoder(lex)
    rng = np.random.default_rng(5)
    B, T, V = 3, 5, 1 + len(lex.tokens)
    logp = np.log(
        rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
    )
    lens = np.asarray([1.0, 0.8, 0.6])
    batched = dec.decode(logp, lens)
    for b in range(B):
        n = int(round(float(lens[b]) * T))
        _, ol = intersect_viterbi(logp[b], n, dec.graph)
        assert batched[b] == [dec.id2word[o] for o in ol]


def test_nbest_rescoring_changes_ranking(tmp_path):
    from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
        NBestDecoder, get_decoding,
    )
    from speechbrain_tpu.lm.ngram import BackoffNgramLM

    lex = _lang(tmp_path)
    plain = NBestDecoder(lex, num_paths=6)
    rng = np.random.default_rng(11)
    T, V = 4, 1 + len(lex.tokens)
    logp = np.log(
        rng.dirichlet(np.ones(V), size=(1, T)).astype(np.float32)
    )
    best, nbest = plain.decode(logp, return_nbest=True)
    distinct = {tuple(w) for _, w in nbest[0]}
    assert len(distinct) >= 2, "need >= 2 distinct word hypotheses"
    # random per-word LM; the decoder's pick must equal the combined
    # ranking recomputed by hand over the same n-best list
    words = [w for w in lex.word_table if w != "<eps>"]
    r2 = np.random.default_rng(23)
    ngrams = {1: {(w,): float(-r2.uniform(0.1, 3.0)) for w in words}}
    ngrams[1][("<s>",)] = -0.1
    ngrams[1][("</s>",)] = -0.1
    lm = BackoffNgramLM(ngrams, {})
    scale = 5.0
    rescored = get_decoding(
        "nbest-rescoring", lexicon=lex, num_paths=6, rescore_lm=lm,
        lm_scale=scale,
    )["decoder"]
    got = rescored.decode(logp)

    def lm_total(ws):
        seq = ["<s>", *ws, "</s>"]
        return sum(
            lm.logprob(seq[j], tuple(seq[max(0, j - 1): j]))
            for j in range(1, len(seq))
        )

    want = max(nbest[0], key=lambda p: p[0] + scale * lm_total(p[1]))[1]
    assert got[0] == want, (got, want, nbest[0])


def test_whole_lattice_rescoring_matches_brute_force(tmp_path):
    from speechbrain_tpu.integrations.k2_fsa.fsa import EPS
    from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
        get_decoding,
    )
    from speechbrain_tpu.lm.ngram import BackoffNgramLM

    lex = _lang(tmp_path)
    words = [w for w in lex.word_table if w != "<eps>"]
    rng = np.random.default_rng(17)
    ngrams = {1: {(w,): float(-rng.uniform(0.1, 1.0)) for w in words}}
    lm = BackoffNgramLM(ngrams, {})
    dec = get_decoding(
        "whole-lattice-rescoring", lexicon=lex, rescore_lm=lm,
        lm_scale=0.7,
    )["decoder"]
    T, V = 4, 1 + len(lex.tokens)
    logp = np.log(
        rng.dirichlet(np.ones(V), size=(1, T)).astype(np.float32)
    )
    got = dec.decode(logp)[0]
    want = _enumerate_paths(dec.graph, logp[0], T)
    best = max(want, key=lambda x: x[0])
    assert got == [dec.id2word[o] for o in best[1] if o != EPS]
