"""Native weighted-FSA toolkit replacing the k2 C++ dependency.

Capability parity with the graph machinery the reference gets from k2
(``speechbrain/integrations/k2_fsa/graph_compiler.py:98`` compile_HLG,
``lattice_decoder.py:453`` one-best intersection): arc-list automata in
numpy, CTC topology construction, L/G/HLG composition with epsilon
removal — built host-side once per setup — plus dense intersection
(Viterbi and forward) against frame posteriors expressed as
``lax.scan`` programs, so decoding and LF-MMI scoring run jitted on
TPU and the forward pass is differentiable w.r.t. the posteriors.

Graphs here are modest (lexicon + n-gram scale); composition is the
textbook product construction, adequate for the recipe surface without
k2's determinization machinery.
"""

import dataclasses

import numpy as np

EPS = -1  # epsilon label (0 is the CTC blank emission)
NEG_INF = -1e30


@dataclasses.dataclass
class Fsa:
    """Arc-list automaton: ``arcs[k] = (src, dst, ilabel, olabel)`` with
    ``weights[k]`` in natural log; ``final[s]`` is the final weight of
    state ``s`` (-inf if not final). State 0 is the start state."""

    arcs: np.ndarray  # (A, 4) int32
    weights: np.ndarray  # (A,) float32
    final: np.ndarray  # (S,) float32
    num_states: int

    @classmethod
    def from_list(cls, arcs, final_states, num_states=None):
        """arcs: iterable of (src, dst, ilabel, olabel, weight);
        final_states: iterable of states or {state: weight}."""
        a = np.asarray(
            [(s, d, i, o) for s, d, i, o, _ in arcs], np.int32
        ).reshape(-1, 4)
        w = np.asarray([x[4] for x in arcs], np.float32)
        n = num_states or int(
            max(
                [a[:, 0].max() + 1 if len(a) else 1,
                 a[:, 1].max() + 1 if len(a) else 1]
                + [s + 1 for s in (
                    final_states.keys()
                    if isinstance(final_states, dict) else final_states
                )]
            )
        )
        f = np.full(n, NEG_INF, np.float32)
        if isinstance(final_states, dict):
            for s, fw in final_states.items():
                f[s] = fw
        else:
            for s in final_states:
                f[s] = 0.0
        return cls(a, w, f, n)


def linear_fsa(labels):
    """Acceptor of exactly the given label sequence."""
    arcs = [
        (i, i + 1, int(l), int(l), 0.0) for i, l in enumerate(labels)
    ]
    return Fsa.from_list(arcs, [len(labels)], num_states=len(labels) + 1)


def ctc_topo(num_tokens):
    """Standard CTC topology over emissions {0=blank, 1..num_tokens}
    (the k2 ``ctc_topo``): state 0 is the blank/start state, state t
    remembers the last emitted real token; repeats collapse via
    self-loops with epsilon output; every state is final."""
    arcs = []
    for t in range(1, num_tokens + 1):
        arcs.append((0, t, t, t, 0.0))  # emit token t
        arcs.append((t, t, t, EPS, 0.0))  # repeat collapses
        arcs.append((t, 0, 0, EPS, 0.0))  # blank resets
        for u in range(1, num_tokens + 1):
            if u != t:
                arcs.append((t, u, u, u, 0.0))  # direct change
    arcs.append((0, 0, 0, EPS, 0.0))  # leading/looping blank
    return Fsa.from_list(
        arcs, list(range(num_tokens + 1)), num_states=num_tokens + 1
    )


def lexicon_fst(word_to_tokens, token2id, word2id):
    """L: token-sequence input -> word output, closed over word
    sequences (loop back to start). Epsilon-input arcs carry the
    word-end return."""
    arcs = []
    n = 1
    for word, toks in word_to_tokens.items():
        ids = [token2id[t] for t in toks]
        prev = 0
        for j, t in enumerate(ids):
            out = word2id[word] if j == 0 else EPS
            if j == len(ids) - 1:
                arcs.append((prev, 0, t, out, 0.0))
            else:
                arcs.append((prev, n, t, out, 0.0))
                prev = n
                n += 1
    return Fsa.from_list(arcs, [0], num_states=max(n, 1))


def ngram_fsa(lm, word2id):
    """Word-level G acceptor from a ``BackoffNgramLM``-style object
    (lm.top_order, lm.logprob(word, context) in log10 via natural-log
    conversion is the caller's concern): built over observed contexts
    with epsilon backoff arcs. For unigram/bigram LMs only (matching
    decoders.scorer.NgramDenseScorer's in-loop support)."""
    LOG10 = 2.302585092994046
    words = [w for w in word2id if w not in ("<eps>",)]
    # states: 0 = empty context; 1 + i = context (word_i) for bigrams
    arcs = []
    has_bigram = getattr(lm, "top_order", 1) >= 2
    state_of = {(): 0}
    if has_bigram:
        for i, w in enumerate(words):
            state_of[(w,)] = 1 + i
    for w in words:
        lp = lm.logprob(w, ()) * LOG10
        dst = state_of.get((w,), 0)
        arcs.append((0, dst, word2id[w], word2id[w], lp))
    if has_bigram:
        for c in words:
            src = state_of[(c,)]
            # backoff to the empty context
            arcs.append((src, 0, EPS, EPS, 0.0))
            for w in words:
                lp = lm.logprob(w, (c,)) * LOG10
                dst = state_of.get((w,), 0)
                arcs.append((src, dst, word2id[w], word2id[w], lp))
    n = 1 + (len(words) if has_bigram else 0)
    return Fsa.from_list(
        arcs, list(range(n)), num_states=n
    )


def compose(a, b):
    """Product construction A ∘ B matching ``a.olabel`` to ``b.ilabel``
    (epsilon-aware: eps-output arcs of A and eps-input arcs of B advance
    one side only). Result ilabels come from A, olabels from B."""
    from collections import deque

    a_by_src = {}
    for k in range(len(a.arcs)):
        a_by_src.setdefault(int(a.arcs[k, 0]), []).append(k)
    b_by_src = {}
    for k in range(len(b.arcs)):
        b_by_src.setdefault(int(b.arcs[k, 0]), []).append(k)

    state_id = {(0, 0): 0}
    queue = deque([(0, 0)])
    arcs = []
    while queue:
        qa, qb = queue.popleft()
        src = state_id[(qa, qb)]

        def dst_id(na, nb):
            if (na, nb) not in state_id:
                state_id[(na, nb)] = len(state_id)
                queue.append((na, nb))
            return state_id[(na, nb)]

        for ka in a_by_src.get(qa, []):
            _, da, ia, oa = (int(v) for v in a.arcs[ka])
            wa = float(a.weights[ka])
            if oa == EPS:  # A advances alone
                arcs.append((src, dst_id(da, qb), ia, EPS, wa))
                continue
            for kb in b_by_src.get(qb, []):
                _, db, ib, ob = (int(v) for v in b.arcs[kb])
                if ib == oa:
                    arcs.append(
                        (src, dst_id(da, db), ia, ob,
                         wa + float(b.weights[kb]))
                    )
        for kb in b_by_src.get(qb, []):
            _, db, ib, ob = (int(v) for v in b.arcs[kb])
            if ib == EPS:  # B advances alone
                arcs.append(
                    (src, dst_id(qa, db), EPS, ob, float(b.weights[kb]))
                )
    n = len(state_id)
    final = np.full(n, NEG_INF, np.float32)
    for (qa, qb), s in state_id.items():
        f = float(a.final[qa]) + float(b.final[qb])
        final[s] = f if f > NEG_INF / 2 else NEG_INF
    arc_arr = np.asarray(
        [x[:4] for x in arcs], np.int32
    ).reshape(-1, 4)
    return Fsa(
        arc_arr, np.asarray([x[4] for x in arcs], np.float32), final, n,
    )


def remove_eps_input(fsa, semiring="log"):
    """Eliminate epsilon-INPUT arcs by closing them into the following
    real arcs and final weights (iterative relaxation, assumes no
    negative-gain epsilon cycles — true for backoff/word-end arcs).
    ``semiring``: "log" (sum over paths) or "max" (best path)."""
    S = fsa.num_states
    # eps-closure matrix C[s, t] = weight of best/sum eps path s->t
    C = np.full((S, S), NEG_INF, np.float64)
    C[np.arange(S), np.arange(S)] = 0.0
    eps_mask = fsa.arcs[:, 2] == EPS
    for _ in range(S):
        prev = C.copy()
        for k in np.nonzero(eps_mask)[0]:
            s, d = int(fsa.arcs[k, 0]), int(fsa.arcs[k, 1])
            cand = prev[:, s] + float(fsa.weights[k])
            if semiring == "max":
                C[:, d] = np.maximum(C[:, d], cand)
            else:
                C[:, d] = np.logaddexp(C[:, d], cand)
        if np.allclose(C, prev):
            break
    arcs, weights = [], []
    real = np.nonzero(~eps_mask)[0]
    for s in range(S):
        closure = np.nonzero(C[s] > NEG_INF / 2)[0]
        for t in closure:
            cw = C[s, t]
            for k in real:
                if int(fsa.arcs[k, 0]) == t:
                    arcs.append(
                        (s, int(fsa.arcs[k, 1]), int(fsa.arcs[k, 2]),
                         int(fsa.arcs[k, 3]))
                    )
                    weights.append(cw + float(fsa.weights[k]))
    final = np.full(S, NEG_INF, np.float32)
    for s in range(S):
        vals = fsa.final.astype(np.float64) + C[s]
        if semiring == "max":
            final[s] = vals.max()
        else:
            m = vals.max()
            final[s] = (
                m + np.log(np.exp(vals - m).sum()) if m > NEG_INF / 2
                else NEG_INF
            )
    return Fsa(
        np.asarray(arcs, np.int32).reshape(-1, 4),
        np.asarray(weights, np.float32), final, S,
    )


# ---------------------------------------------------------------------------
# Dense intersection with frame posteriors (jitted scan programs)
# ---------------------------------------------------------------------------

def _intersect_scan(log_probs, n_frames, fsa, mode):
    """Shared Viterbi/forward recursion over an eps-free automaton.
    Returns (per-frame state scores (T+1, S), backpointer arc ids
    (T, S) for mode='max')."""
    import jax
    import jax.numpy as jnp

    log_probs = jnp.asarray(log_probs)
    src = jnp.asarray(fsa.arcs[:, 0])
    dst = jnp.asarray(fsa.arcs[:, 1])
    ilab = jnp.asarray(fsa.arcs[:, 2])
    w = jnp.asarray(fsa.weights)
    S = fsa.num_states
    init = jnp.full((S,), NEG_INF).at[0].set(0.0)

    def body(carry, t):
        score = carry
        arc_sc = score[src] + w + log_probs[t, ilab]
        arc_sc = jnp.where(t < n_frames, arc_sc, NEG_INF)
        if mode == "max":
            new = jax.ops.segment_max(arc_sc, dst, num_segments=S)
            best_arc = jnp.full((S,), -1, jnp.int32)
            # arc achieving the max per dst (first hit wins)
            hit = arc_sc >= new[dst] - 1e-6
            best_arc = best_arc.at[dst].max(
                jnp.where(hit, jnp.arange(len(w)), -1)
            )
            new = jnp.where(t < n_frames, new, score)
            best_arc = jnp.where(t < n_frames, best_arc, -1)
            return new, (new, best_arc)
        m = jax.ops.segment_max(arc_sc, dst, num_segments=S)
        m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
        e = jax.ops.segment_sum(
            jnp.exp(arc_sc - m_safe[dst]), dst, num_segments=S
        )
        new = jnp.where(m > NEG_INF / 2, m + jnp.log(e + 1e-37), NEG_INF)
        new = jnp.where(t < n_frames, new, score)
        return new, (new, jnp.zeros((S,), jnp.int32))

    T = log_probs.shape[0]
    last, (scores, bps) = jax.lax.scan(body, init, jnp.arange(T))
    scores = jnp.concatenate([init[None], scores], axis=0)
    return last, scores, bps


def intersect_forward(log_probs, n_frames, fsa):
    """Total log-score of all paths of the eps-free ``fsa`` against
    ``log_probs`` (T, V) over the first ``n_frames`` frames —
    differentiable w.r.t. log_probs (the LF-MMI building block)."""
    import jax.numpy as jnp

    last, _, _ = _intersect_scan(log_probs, n_frames, fsa, "log")
    vals = last + jnp.asarray(fsa.final)
    m = jnp.max(vals)
    return m + jnp.log(jnp.sum(jnp.exp(vals - m)) + 1e-37)


def intersect_viterbi(log_probs, n_frames, fsa):
    """Best path of the eps-free ``fsa`` against ``log_probs``:
    returns (score, olabel sequence) — host-side backtrace."""
    import jax.numpy as jnp

    last, scores, bps = _intersect_scan(log_probs, n_frames, fsa, "max")
    vals = np.asarray(last + jnp.asarray(fsa.final))
    state = int(np.argmax(vals))
    score = float(vals[state])
    bps = np.asarray(bps)
    olabels = []
    for t in range(int(n_frames) - 1, -1, -1):
        k = int(bps[t, state])
        if k < 0:
            break
        o = int(fsa.arcs[k, 3])
        if o != EPS:
            olabels.append(o)
        state = int(fsa.arcs[k, 0])
    return score, olabels[::-1]


def intersect_viterbi_batch(log_probs, n_frames, fsa):
    """Batched one-best: the Viterbi scan runs as ONE vmapped device
    program over the whole batch (the round-3 decoder looped utterances
    on the host); backtraces stay host-side. Returns a list of
    (score, olabels)."""
    import jax
    import jax.numpy as jnp

    log_probs = jnp.asarray(log_probs)
    n_frames = jnp.asarray(n_frames, jnp.int32)
    last, _, bps = jax.vmap(
        lambda lp, n: _intersect_scan(lp, n, fsa, "max")
    )(log_probs, n_frames)
    vals = np.asarray(last + jnp.asarray(fsa.final)[None])
    bps = np.asarray(bps)
    n_frames = np.asarray(n_frames)
    out = []
    for b in range(log_probs.shape[0]):
        state = int(np.argmax(vals[b]))
        score = float(vals[b, state])
        olabels = []
        for t in range(int(n_frames[b]) - 1, -1, -1):
            k = int(bps[b, t, state])
            if k < 0:
                break
            o = int(fsa.arcs[k, 3])
            if o != EPS:
                olabels.append(o)
            state = int(fsa.arcs[k, 0])
        out.append((score, olabels[::-1]))
    return out


def intersect_kbest(log_probs, n_frames, fsa, k):
    """Top-``k`` best paths of the eps-free ``fsa`` against ``log_probs``
    (T, V): a k-best Viterbi DP — per state the k best incoming
    (arc, predecessor-slot) extensions each frame, all jitted; the
    backtrace is host-side. Returns up to k (score, olabels) pairs,
    best first. This is the deterministic native analogue of the
    reference's k2 ``nbest`` path sampling (lattice_decoder.py:453) —
    exact top-k instead of random paths."""
    import jax
    import jax.numpy as jnp

    log_probs = jnp.asarray(log_probs)
    src = jnp.asarray(fsa.arcs[:, 0])
    dst = jnp.asarray(fsa.arcs[:, 1])
    ilab = jnp.asarray(fsa.arcs[:, 2])
    w = jnp.asarray(fsa.weights)
    A, S = len(fsa.weights), fsa.num_states
    seg = jnp.repeat(dst, k)  # flat (A*k,) segment ids
    init = jnp.full((S, k), NEG_INF).at[0, 0].set(0.0)

    def body(carry, t):
        dp = carry  # (S, k)
        ext = dp[src] + (w + log_probs[t, ilab])[:, None]  # (A, k)
        vals = jnp.where(t < n_frames, ext.reshape(-1), NEG_INF)
        new = []
        bpt = []
        for _ in range(k):
            m = jax.ops.segment_max(vals, seg, num_segments=S)
            # smallest flat index achieving the per-segment max
            hit = vals >= m[seg] - 1e-6
            idx = jax.ops.segment_min(
                jnp.where(hit, jnp.arange(A * k), A * k), seg,
                num_segments=S,
            )
            valid = m > NEG_INF / 2
            new.append(jnp.where(valid, m, NEG_INF))
            bpt.append(jnp.where(valid, idx, -1))
            # knock the chosen elements out for the next round (invalid
            # segments write a dummy padded slot, so every scatter value
            # is NEG_INF and collisions are harmless)
            idx_c = jnp.where(valid, idx, A * k)
            vals = jnp.concatenate([vals, jnp.array([NEG_INF])])
            vals = vals.at[idx_c].set(NEG_INF)[: A * k]
        new = jnp.stack(new, axis=1)  # (S, k)
        bpt = jnp.stack(bpt, axis=1).astype(jnp.int32)
        new = jnp.where(t < n_frames, new, dp)
        bpt = jnp.where(t < n_frames, bpt, -1)
        return new, bpt

    T = log_probs.shape[0]
    last, bps = jax.lax.scan(body, init, jnp.arange(T))
    vals = np.asarray(last + np.asarray(fsa.final)[:, None])  # (S, k)
    bps = np.asarray(bps)  # (T, S, k) flat index into (A*k) or -1
    order = np.argsort(-vals.reshape(-1), kind="stable")[:k]
    out = []
    for flat in order:
        state, slot = divmod(int(flat), k)
        score = float(vals[state, slot])
        if score <= NEG_INF / 2:
            break
        olabels = []
        s, j = state, slot
        for t in range(int(n_frames) - 1, -1, -1):
            fidx = int(bps[t, s, j])
            if fidx < 0:
                break
            arc, j = divmod(fidx, k)
            o = int(fsa.arcs[arc, 3])
            if o != EPS:
                olabels.append(o)
            s = int(fsa.arcs[arc, 0])
        out.append((score, olabels[::-1]))
    return out
