"""Pluggable scorers for LM fusion and joint decoding in beam search.

Capability parity with the reference's ``speechbrain/decoders/scorer.py``
(BaseScorerInterface :16 with score/permute_mem/reset_mem, CTCScorer :108,
RNNLMScorer :258, TransformerLMScorer :413, KenLMScorer :579,
CoverageScorer :788, LengthScorer :956, ScorerBuilder :1075, and the
RescorerBuilder family :1410+).

All scorers are pure: state in, state out; they run INSIDE the jitted
beam-search loop. Full scorers contribute over the entire vocab; partial
scorers (CTC prefix) score a pruned candidate set of size
``scorer_beam_scale * beam_size`` and are scattered back.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.decoders.permute import gather_rows, gather_tree

NEG_INF = -1e9


class BaseScorerInterface:
    """Protocol (reference scorer.py:16): implementations are pure."""

    def score(self, inp_tokens, memory, candidates, attn):
        """Return (scores, new_memory). For full scorers, scores has shape
        (n_bh, vocab); for partial scorers, (n_bh, n_cand) aligned with
        ``candidates``."""
        raise NotImplementedError

    def permute_mem(self, memory, index):
        return gather_tree(memory, index, getattr(self, "_beam_layout", None))

    def reset_mem(self, x, enc_lens):
        return None

    def is_partial(self):
        return False


class RNNLMScorer(BaseScorerInterface):
    """Shallow fusion with an RNN LM (reference scorer.py:258).

    ``lm_fn(tokens (N,1), state)`` -> (logits (N,1,V), new_state);
    ``lm_init(n)`` -> initial state.
    """

    def __init__(self, lm_fn, lm_init, temperature=1.0):
        self.lm_fn = lm_fn
        self.lm_init = lm_init
        self.temperature = temperature

    def reset_mem(self, x, enc_lens):
        return self.lm_init(x.shape[0])

    def score(self, inp_tokens, memory, candidates, attn):
        logits, new_state = self.lm_fn(inp_tokens[:, None], memory)
        log_probs = jax.nn.log_softmax(logits[:, 0] / self.temperature, axis=-1)
        return log_probs, new_state


class TransformerLMScorer(BaseScorerInterface):
    """Shallow fusion with a causal transformer LM (reference scorer.py:413).

    The memory is a fixed-size token buffer (like the transformer beam
    searcher); ``lm_fn(buffer)`` -> logits (N, L, V).
    """

    def __init__(self, lm_fn, bos_index, max_length=512, temperature=1.0,
                 eos_index=0):
        self.lm_fn = lm_fn
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.max_length = max_length
        self.temperature = temperature

    def reset_mem(self, x, enc_lens):
        buf = jnp.full((x.shape[0], self.max_length), self.eos_index, jnp.int32)
        buf = buf.at[:, 0].set(self.bos_index)
        return {"tokens": buf, "step": jnp.zeros((), jnp.int32)}

    def score(self, inp_tokens, memory, candidates, attn):
        step = memory["step"]
        buf = memory["tokens"].at[:, step].set(inp_tokens)
        logits = self.lm_fn(buf)
        log_probs_all = jax.nn.log_softmax(logits / self.temperature, axis=-1)
        log_probs = jax.lax.dynamic_slice_in_dim(log_probs_all, step, 1, axis=1)[:, 0]
        return log_probs, {"tokens": buf, "step": step + 1}

    def permute_mem(self, memory, index):
        return {"tokens": memory["tokens"][index], "step": memory["step"]}


class KVTransformerLMScorer(BaseScorerInterface):
    """KV-cached transformer-LM shallow fusion: O(step) work per decode
    step instead of re-running the LM over the whole token buffer (the
    serving-speed variant of :class:`TransformerLMScorer`; same scores).

    Arguments
    ---------
    step_fn : (tokens (N,), cache, step) -> (logits (N, V), new_cache)
        e.g. ``lambda t, c, s: lm.apply(v, t, c, s, method="score_step")``.
    init_cache_fn : (n, max_length) -> cache pytree with batch-leading
        leaves (the beam predecessor gather permutes axis 0).
    """

    def __init__(self, step_fn, init_cache_fn, max_length=512,
                 temperature=1.0, ancestry=False):
        self.step_fn = step_fn
        self.init_cache_fn = init_cache_fn
        self.max_length = max_length
        self.temperature = temperature
        # ancestry=True: cache rows never move; ``step_fn`` takes a
        # fourth (B_utt, beam, L) ancestry argument and routes it into
        # the LM's cached attention (ops/beam_attention.py) — removes
        # the per-step multi-GB cache permute of large-beam fusion
        self.ancestry = ancestry

    def reset_mem(self, x, enc_lens):
        mem = {
            "cache": self.init_cache_fn(x.shape[0], self.max_length),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.ancestry:
            B, K = self._beam_layout
            # match the CACHE's (possibly tile-rounded) length so the
            # beam-attention kernel never pads the multi-GB buffers
            L = next(
                leaf.shape[1]
                for leaf in jax.tree_util.tree_leaves(mem["cache"])
                if hasattr(leaf, "ndim") and leaf.ndim >= 2
            )
            mem["anc"] = jnp.asarray(jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, L)
            ))
        return mem

    def score(self, inp_tokens, memory, candidates, attn):
        if self.ancestry:
            from speechbrain_tpu.decoders.seq2seq import _stamp_self_column

            memory = {**memory,
                      "anc": _stamp_self_column(memory["anc"],
                                                memory["step"])}
            logits, cache = self.step_fn(
                inp_tokens, memory["cache"], memory["step"], memory["anc"]
            )
        else:
            logits, cache = self.step_fn(
                inp_tokens, memory["cache"], memory["step"]
            )
        log_probs = jax.nn.log_softmax(logits / self.temperature, axis=-1)
        return log_probs, {**memory, "cache": cache,
                           "step": memory["step"] + 1}

    def permute_mem(self, memory, index):
        if self.ancestry:
            anc = memory["anc"]
            B, K, L = anc.shape
            anc = jnp.take(
                anc.reshape(B * K, L), index, axis=0
            ).reshape(B, K, L)
            return {**memory, "anc": anc}
        return {
            "cache": gather_tree(
                memory["cache"], index, getattr(self, "_beam_layout", None)
            ),
            "step": memory["step"],
        }


class CTCScorer(BaseScorerInterface):
    """Joint CTC prefix scoring (partial scorer; reference scorer.py:108).

    Built fresh per utterance batch inside ScorerBuilder.reset_scorer_mem
    from the CTC head's log-probs.
    """

    # matches the reference CTCPrefixScore's own mask value
    # (ref decoders/ctc.py:53) — NOT the searcher's minus_inf
    CTC_MINUS_INF = -1e20

    def __init__(self, ctc_fn, blank_index, eos_index, ctc_window_size=0):
        # ctc_fn(enc_states) -> (B*, T, V) CTC log-probs (usually a Linear
        # + log_softmax over the inflated encoder states)
        self.ctc_fn = ctc_fn
        self.blank_index = blank_index
        self.eos_index = eos_index
        self.ctc_window_size = ctc_window_size
        self._impl = None

    @property
    def vocab_size(self):
        return self._impl.V

    def reset_mem(self, x, enc_lens, n_bh=None):
        from speechbrain_tpu.decoders.ctc import CTCPrefixScore

        log_probs = self.ctc_fn(x)
        self._impl = CTCPrefixScore(
            log_probs, enc_lens, self.blank_index, self.eos_index,
            self.ctc_window_size,
        )
        # x may be the UNINFLATED per-utterance states with n_bh =
        # batch*beam hypotheses: the prefix scorer shares the posteriors
        # across each utterance's beams
        n = n_bh or x.shape[0]
        state = self._impl.init_state(n)
        # NOTE: the state dict must keep the same pytree structure across
        # the beam fori_loop carry: reset_mem and permute_and_select both
        # produce exactly {r_b, r_n, psi_prev, is_first}.
        state["is_first"] = jnp.ones((n,), bool)
        return state

    def is_partial(self):
        return True

    def score(self, inp_tokens, memory, candidates, attn):
        """Score candidate extensions; returns FULL-vocab scores with the
        reference's -1e20 at unscored tokens, so non-candidates are
        effectively blocked from selection (ref ctc.py:216-241 fills psi
        with minus_inf outside the candidate set)."""
        # inp_tokens are the tokens just consumed (last of prefix g)
        if candidates is None:
            # full-vocab scoring (ctc_weight == 1.0 paths): every token is
            # a candidate, like the reference's x_inflate full-search arm
            candidates = jnp.broadcast_to(
                jnp.arange(self._impl.V, dtype=jnp.int32)[None],
                (inp_tokens.shape[0], self._impl.V),
            )
        _, new_states = self._impl.forward_step(
            memory["is_first"], inp_tokens, candidates, memory
        )
        psi = new_states["psi"]  # (n_bh, n_cand)
        # blank is not a valid extension for joint scoring (ref ctc.py:237)
        if self.eos_index != self.blank_index:
            psi = jnp.where(
                candidates == self.blank_index, self.CTC_MINUS_INF, psi
            )
        new_states["psi"] = psi
        n_bh = psi.shape[0]
        psi_full = jnp.full((n_bh, self._impl.V), self.CTC_MINUS_INF)
        psi_full = psi_full.at[
            jnp.arange(n_bh)[:, None], candidates
        ].set(psi)
        scores = psi_full - memory["psi_prev"][:, None]
        new_states["candidates"] = candidates
        new_states["is_first"] = jnp.zeros_like(memory["is_first"])
        return scores, new_states

    def permute_and_select(self, new_states, hyp_index, new_tokens):
        """Select the forward variables of the chosen (hyp, token) pairs
        (reference ctc.py permute_mem:243)."""
        cands = new_states["candidates"][hyp_index]  # (n_bh, n_cand)
        # find the candidate slot matching each new token
        match = cands == new_tokens[:, None]
        cand_idx = jnp.argmax(match, axis=-1)
        found = jnp.any(match, axis=-1)
        # unscored chosen token: the reference falls back to candidate
        # slot 0's forward variables with psi_prev = minus_inf
        # (ref ctc.py:284-288: scoring_table miss -> index 0; psi select
        # reads the minus_inf-filled psi matrix). argmax already yields 0
        # on no-match, so only psi needs the mask.
        layout = getattr(self, "_beam_layout", None)
        if layout is not None:
            # joint (hyp -> (pred, cand)) selection as ONE block-diagonal
            # one-hot matmul per utterance: the (n_bh, T, n_cand) forward
            # variables are reshaped to (B, K*n_cand, T) and contracted
            # with a (B, K, K*n_cand) one-hot — the advanced-index gather
            # this replaces was a measured decode-step hot spot at beam
            # 66 (TPU row gathers run far below HBM bandwidth)
            n_cand = new_states["r_b"].shape[-1]
            B, K = layout
            T = new_states["r_b"].shape[1]
            src = hyp_index.reshape(B, K) - (
                jnp.arange(B, dtype=hyp_index.dtype) * K
            )[:, None]
            joint = src * n_cand + cand_idx.reshape(B, K)
            W = jax.nn.one_hot(
                joint, K * n_cand, dtype=new_states["r_b"].dtype
            )  # (B, K, K*n_cand)

            def sel3(t):
                flat = jnp.moveaxis(
                    t.reshape(B, K, T, n_cand), 3, 2
                ).reshape(B, K * n_cand, T)
                out = jax.lax.dot_general(
                    W, flat, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return out.reshape(B * K, T)

            r_b = sel3(new_states["r_b"])
            r_n = sel3(new_states["r_n"])
            psi = jnp.sum(
                new_states["psi"][hyp_index]
                * jax.nn.one_hot(cand_idx, n_cand,
                                 dtype=new_states["psi"].dtype), -1
            )
            state = {"r_b": r_b, "r_n": r_n, "psi_prev": psi}
        else:
            state = self._impl.select_state(
                jax.tree_util.tree_map(lambda t: t, new_states),
                hyp_index, cand_idx,
            )
        state["psi_prev"] = jnp.where(
            found, state["psi_prev"], self.CTC_MINUS_INF
        )
        state["is_first"] = jnp.zeros((hyp_index.shape[0],), bool)
        return state


class CoverageScorer(BaseScorerInterface):
    """Penalize looping/over-attended frames using accumulated attention
    (reference scorer.py:788). Full scorer, reference-exact semantics:
    ``penalty = sum(max(coverage, threshold)) - T*threshold``, divided
    by the decode step count, applied uniformly to the whole vocab;
    transformer (3-D) attention replaces the running sum with the
    current prefix's query-summed attention."""

    def __init__(self, vocab_size, threshold=0.5):
        self.vocab_size = vocab_size
        self.threshold = threshold

    def reset_mem(self, x, enc_lens):
        return {
            "coverage": jnp.zeros((x.shape[0], x.shape[1])),
            "step": jnp.zeros((), jnp.int32),
        }

    def score(self, inp_tokens, memory, candidates, attn):
        n = inp_tokens.shape[0]
        step = memory["step"] + 1
        if attn is None:
            return (
                jnp.zeros((n, self.vocab_size)),
                {"coverage": memory["coverage"], "step": step},
            )
        if attn.ndim > 2:
            # transformer attention (n_bh, cur_steps, src_len): the
            # prefix's coverage is its query-summed attention
            coverage = jnp.sum(attn, axis=1)
        else:
            coverage = memory["coverage"] + attn
        T = coverage.shape[-1]
        penalty = (
            jnp.sum(jnp.maximum(coverage, self.threshold), axis=-1)
            - T * self.threshold
        )
        scores = jnp.broadcast_to(
            (-penalty / step)[:, None], (n, self.vocab_size)
        )
        return scores, {"coverage": coverage, "step": step}

    def permute_mem(self, memory, index):
        return {
            "coverage": gather_rows(
                memory["coverage"], index, getattr(self, "_beam_layout", None)
            ),
            "step": memory["step"],
        }


class LengthScorer(BaseScorerInterface):
    """Constant per-step length reward (reference scorer.py:956)."""

    def __init__(self, vocab_size):
        self.vocab_size = vocab_size

    def score(self, inp_tokens, memory, candidates, attn):
        return jnp.ones((inp_tokens.shape[0], self.vocab_size)), None

    def permute_mem(self, memory, index):
        return None


class NgramDenseScorer(BaseScorerInterface):
    """In-loop n-gram fusion over dense log10 score tensors (the jit-safe
    replacement for the reference's kenlm binding, scorer.py:579).

    Arguments
    ---------
    unigram : (V,) log10 unigram scores.
    bigram : (V, V) log10 bigram scores with backoff applied, or None for
        a unigram LM. Build both with ``lm.arpa.arpa_to_dense``.
    """

    LOG10 = 2.302585092994046  # convert ARPA log10 to natural log

    def __init__(self, unigram, bigram=None):
        self.unigram = jnp.asarray(unigram) * self.LOG10
        self.bigram = None if bigram is None else jnp.asarray(bigram) * self.LOG10

    def reset_mem(self, x, enc_lens):
        # first step has no history: score with unigrams
        return {"has_history": jnp.zeros((x.shape[0],), bool)}

    def score(self, inp_tokens, memory, candidates, attn):
        n = inp_tokens.shape[0]
        uni = jnp.broadcast_to(self.unigram[None], (n, self.unigram.shape[0]))
        if self.bigram is None:
            scores = uni
        else:
            bi = self.bigram[inp_tokens]  # (n, V)
            scores = jnp.where(memory["has_history"][:, None], bi, uni)
        return scores, {"has_history": jnp.ones((n,), bool)}


class KenLMScorer(NgramDenseScorer):
    """ARPA n-gram scorer with the reference's KenLMScorer surface
    (scorer.py:579): built from an ARPA file + token list. Orders > 2
    need the host-side rescoring path (RescorerBuilder + BackoffNgramLM)."""

    def __init__(self, lm_path, vocab_size, token_list):
        from speechbrain_tpu.lm.arpa import arpa_to_dense

        token_to_id = {t: i for i, t in enumerate(token_list)}
        dense = arpa_to_dense(lm_path, token_to_id, vocab_size, max_order=2)
        if isinstance(dense, tuple):
            super().__init__(*dense)
        else:
            super().__init__(dense)


class ScorerBuilder:
    """Combine weighted scorers, full and partial (reference scorer.py:1075).

    Arguments
    ---------
    weights : dict name -> float
    full_scorers / partial_scorers : dict name -> scorer
    scorer_beam_scale : float
        Candidate set size for partial scorers = scale * beam_size.
    """

    def __init__(self, weights={}, full_scorers={}, partial_scorers={},
                 scorer_beam_scale=2.0):
        self.weights = dict(weights)
        self.full_scorers = dict(full_scorers)
        self.partial_scorers = dict(partial_scorers)
        self.scorer_beam_scale = scorer_beam_scale

    def set_beam_layout(self, batch, beam):
        """Record the static (batch, beam) layout so scorer-memory
        permutes can run as block-diag one-hot matmuls (the searcher
        calls this before tracing the search loop)."""
        for scorer in {**self.full_scorers, **self.partial_scorers}.values():
            scorer._beam_layout = (batch, beam)

    def reset_scorer_mem(self, x, enc_lens, x_shared=None,
                         lens_shared=None):
        """x is the beam-inflated encoder states. When ``x_shared`` (the
        per-utterance states) is given, scorers that can share encoder
        products across beams (the CTC prefix scorer) are reset from it
        instead — their per-hypothesis state still sizes to x.shape[0]."""
        mem = {}
        for name, scorer in {**self.full_scorers, **self.partial_scorers}.items():
            if x_shared is not None and isinstance(scorer, CTCScorer):
                mem[name] = scorer.reset_mem(
                    x_shared, lens_shared, n_bh=x.shape[0]
                )
            else:
                mem[name] = scorer.reset_mem(x, enc_lens)
        return mem

    def score(self, inp_tokens, memories, attn, log_probs, beam_size):
        """Add weighted scorer contributions to log_probs inside the beam
        loop — reference-ordered (ref scorer.py:1221-1268): full scorers
        first (with blank blocking when CTC scores the full vocab), then
        candidate pruning from the fused log-probs, then the partial
        scorers. Partial scorers return FULL-vocab scores carrying their
        own minus-inf at unscored tokens, so a plain add suffices."""
        new_mem = {}
        for name, scorer in self.full_scorers.items():
            if name == "ctc":
                # block blank when CTC drives full-vocab scoring
                # (reference scorer.py:1249-1250)
                log_probs = log_probs.at[:, scorer.blank_index].set(
                    CTCScorer.CTC_MINUS_INF
                )
            scores, sm = scorer.score(inp_tokens, memories.get(name), None, attn)
            log_probs = log_probs + self.weights.get(name, 1.0) * scores
            new_mem[name] = sm
        if self.partial_scorers:
            n_cand = int(beam_size * self.scorer_beam_scale)
            n_cand = max(1, min(n_cand, log_probs.shape[-1]))
            _, candidates = jax.lax.top_k(log_probs, n_cand)
            for name, scorer in self.partial_scorers.items():
                scores, sm = scorer.score(
                    inp_tokens, memories.get(name), candidates, attn
                )
                log_probs = log_probs + self.weights.get(name, 1.0) * scores
                new_mem[name] = sm
        return log_probs, new_mem

    def permute_scorer_mem(self, memories, index, new_tokens):
        """Reorder all scorer memories after beam pruning. ``index`` is
        the flat predecessor row per surviving hypothesis; ``new_tokens``
        the token each chose (the reference's ``candidates`` in
        beam*vocab space carries the same two pieces of information,
        ref scorer.py:1270-1296)."""
        out = {}
        for name, scorer in self.full_scorers.items():
            mem = memories.get(name)
            if mem is None:
                out[name] = None
            elif hasattr(scorer, "permute_and_select"):
                # CTC/kenlm-style scorers select by (hyp, token) pairs
                # even as full scorers (ref scorer.py:1289-1291)
                out[name] = scorer.permute_and_select(mem, index, new_tokens)
            else:
                out[name] = scorer.permute_mem(mem, index)
        for name, scorer in self.partial_scorers.items():
            mem = memories.get(name)
            if mem is None:
                out[name] = None
            elif hasattr(scorer, "permute_and_select"):
                out[name] = scorer.permute_and_select(mem, index, new_tokens)
            else:
                out[name] = scorer.permute_mem(mem, index)
        return out


# ---------------------------------------------------------------------------
# N-best rescoring (second pass), reference scorer.py:1410-2068
# ---------------------------------------------------------------------------

class BaseRescorerInterface:
    """Second-pass scorer over the beam searcher's n-best output
    (reference BaseRescorerInterface, scorer.py:1410).

    Implementations score COMPLETE hypotheses: ``rescore(tokens, lens)``
    with tokens (N, L) int32 (bos/eos handled internally) returns (N,)
    total LM log-probabilities. Everything runs as one batched jitted
    forward — no per-hypothesis host loops.
    """

    def rescore(self, tokens, lens):
        raise NotImplementedError

    @staticmethod
    def pad_topk(topk_hyps):
        """Pack the beam searcher's return_topk hypothesis lists
        (list[batch] of list[k] of token lists) into (B, K, L) arrays +
        (B, K) lengths."""
        B = len(topk_hyps)
        K = max(len(row) for row in topk_hyps)
        L = max((len(h) for row in topk_hyps for h in row), default=1) or 1
        tokens = np.zeros((B, K, L), np.int32)
        lens = np.zeros((B, K), np.int32)
        for b, row in enumerate(topk_hyps):
            for k, hyp in enumerate(row):
                tokens[b, k, : len(hyp)] = hyp
                lens[b, k] = len(hyp)
        return tokens, lens


class RNNLMRescorer(BaseRescorerInterface):
    """N-best rescoring with an RNN LM (reference RNNLMRescorer :1540).

    ``lm_fn(tokens (N, L), state)`` -> (logits (N, L, V), state) — the
    full-sequence form (teacher-forced); ``lm_init(n)`` -> initial state.
    """

    def __init__(self, lm_fn, lm_init, bos_index, eos_index, pad_index=0,
                 temperature=1.0):
        self.lm_fn = lm_fn
        self.lm_init = lm_init
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.pad_index = pad_index
        self.temperature = temperature

    def rescore(self, tokens, lens):
        tokens = jnp.asarray(tokens, jnp.int32)
        lens = jnp.asarray(lens, jnp.int32)
        N, L = tokens.shape
        # input: bos + tokens; target: tokens + eos
        inp = jnp.concatenate(
            [jnp.full((N, 1), self.bos_index, jnp.int32), tokens], axis=1
        )
        tgt = jnp.concatenate(
            [tokens, jnp.full((N, 1), self.pad_index, jnp.int32)], axis=1
        )
        tgt = tgt.at[jnp.arange(N), lens].set(self.eos_index)
        logits, _ = self.lm_fn(inp, self.lm_init(N))
        logp = jax.nn.log_softmax(logits / self.temperature, axis=-1)
        tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = jnp.arange(L + 1)[None, :] <= lens[:, None]  # include eos slot
        return jnp.sum(tok_lp * mask, axis=-1)


class TransformerLMRescorer(BaseRescorerInterface):
    """N-best rescoring with a causal transformer LM
    (reference TransformerLMRescorer :1726). ``lm_fn(tokens (N, L))`` ->
    logits (N, L, V)."""

    def __init__(self, lm_fn, bos_index, eos_index, pad_index=0,
                 temperature=1.0):
        self.lm_fn = lm_fn
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.pad_index = pad_index
        self.temperature = temperature

    def rescore(self, tokens, lens):
        tokens = jnp.asarray(tokens, jnp.int32)
        lens = jnp.asarray(lens, jnp.int32)
        N, L = tokens.shape
        inp = jnp.concatenate(
            [jnp.full((N, 1), self.bos_index, jnp.int32), tokens], axis=1
        )
        tgt = jnp.concatenate(
            [tokens, jnp.full((N, 1), self.pad_index, jnp.int32)], axis=1
        )
        tgt = tgt.at[jnp.arange(N), lens].set(self.eos_index)
        logits = self.lm_fn(inp)
        logp = jax.nn.log_softmax(logits / self.temperature, axis=-1)
        tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = jnp.arange(L + 1)[None, :] <= lens[:, None]
        return jnp.sum(tok_lp * mask, axis=-1)


class NgramRescorer(BaseRescorerInterface):
    """N-best rescoring with the host-side backoff n-gram LM (any order;
    pairs with lm.ngram.BackoffNgramLM — the kenlm-rescorer analogue)."""

    def __init__(self, lm, bos_token, eos_token, id_to_token):
        self.lm = lm
        self.bos = bos_token
        self.eos = eos_token
        self.id_to_token = id_to_token

    def rescore(self, tokens, lens):
        tokens = np.asarray(tokens)
        lens = np.asarray(lens)
        out = np.zeros((tokens.shape[0],), np.float32)
        for i, (row, ln) in enumerate(zip(tokens, lens)):
            seq = [self.bos] + [self.id_to_token[t] for t in row[:ln]] + [self.eos]
            total = 0.0
            for j in range(1, len(seq)):
                context = tuple(seq[max(0, j - self.lm.top_order + 1): j])
                total += self.lm.logprob(seq[j], context)
            out[i] = total
        return out


class RescorerBuilder:
    """Weight-combine first-pass beam scores with second-pass rescorers and
    rerank the n-best lists (reference RescorerBuilder, scorer.py:1864).

    Arguments
    ---------
    weights : dict name -> float
    rescorers : dict name -> BaseRescorerInterface

    Example flow: run a beam searcher with ``return_topk=True, topk=K``,
    then ``rescore(topk_hyps, topk_scores)`` -> (best_hyps, best_scores).
    """

    def __init__(self, weights={}, rescorers={}):
        self.weights = dict(weights)
        self.rescorers = dict(rescorers)

    def rescore(self, topk_hyps, topk_scores):
        """topk_hyps: list[B] of list[K] token lists; topk_scores: matching
        first-pass scores. Returns (hyps list[B], scores list[B],
        reranked (topk_hyps, topk_scores))."""
        tokens, lens = BaseRescorerInterface.pad_topk(topk_hyps)
        B, K, L = tokens.shape
        flat_tokens = tokens.reshape(B * K, L)
        flat_lens = lens.reshape(B * K)
        combined = np.asarray(
            [[float(s) for s in row] for row in topk_scores], np.float32
        )
        for name, rescorer in self.rescorers.items():
            lm_scores = np.asarray(
                rescorer.rescore(flat_tokens, flat_lens)
            ).reshape(B, K)
            combined = combined + self.weights.get(name, 1.0) * lm_scores
        order = np.argsort(-combined, axis=-1)
        best_hyps, best_scores = [], []
        rr_hyps, rr_scores = [], []
        for b in range(B):
            row = [topk_hyps[b][k] for k in order[b] if k < len(topk_hyps[b])]
            srow = [float(combined[b, k]) for k in order[b] if k < len(topk_hyps[b])]
            rr_hyps.append(row)
            rr_scores.append(srow)
            best_hyps.append(row[0])
            best_scores.append(srow[0])
        return best_hyps, best_scores, (rr_hyps, rr_scores)
