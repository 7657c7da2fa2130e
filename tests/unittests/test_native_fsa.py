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
