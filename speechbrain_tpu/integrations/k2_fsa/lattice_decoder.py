"""Native lattice decoding over HLG-style graphs.

Capability parity with the reference's
``speechbrain/integrations/k2_fsa/lattice_decoder.py`` (get_decoding
:54, get_lattice :453, one_best_decoding) without the k2 dependency:
the decoding graph is built from the lexicon (+ optional word n-gram G)
with the native FSA toolkit (:mod:`.fsa`), and one-best decoding is a
jitted dense Viterbi intersection of the eps-free graph with the CTC
posteriors.
"""

import numpy as np

from speechbrain_tpu.integrations.k2_fsa.fsa import (
    compose,
    ctc_topo,
    intersect_kbest,
    intersect_viterbi,
    intersect_viterbi_batch,
    lexicon_fst,
    ngram_fsa,
    remove_eps_input,
)


def compile_HLG(lexicon, G_lm=None, semiring="max"):
    """Build the eps-free decoding graph H ∘ L (∘ G): CTC topology over
    the lexicon's token inventory, composed with the pronunciation FST
    and optionally a word n-gram acceptor (reference
    graph_compiler.py:98 via k2). The CTC emission ids follow
    CtcGraphCompiler's convention (0 = blank, then lexicon.tokens
    order)."""
    toks = lexicon.tokens  # token_table ids, sans <eps>/disambig
    tok2emit = {t: i + 1 for i, t in enumerate(toks)}
    word_to_tokens = {
        w: prons[0] for w, prons in lexicon.word2tokenids.items()
    }
    word2id = {
        w: i for w, i in lexicon.word_table.items() if w != "<eps>"
    }
    L = lexicon_fst(word_to_tokens, tok2emit, word2id)
    lg = L
    if G_lm is not None:
        lg = compose(L, ngram_fsa(G_lm, word2id))
    topo = ctc_topo(len(toks))
    hlg = compose(topo, lg)
    return remove_eps_input(hlg, semiring=semiring), word2id


class OneBestDecoder:
    """Frame-synchronous one-best HLG decoding (the native analogue of
    the reference's ``one_best_decoding`` over k2 lattices).

    Arguments
    ---------
    lexicon : .lexicon.Lexicon
    G_lm : optional word n-gram LM (lm.ngram.BackoffNgramLM-style).

    ``decode(log_probs, lens)`` with CTC log-posteriors (B, T, V)
    (V = blank + lexicon tokens) returns a list of word-string lists.
    """

    def __init__(self, lexicon, G_lm=None):
        self.graph, word2id = compile_HLG(lexicon, G_lm)
        self.id2word = {i: w for w, i in word2id.items()}

    def decode(self, log_probs, lens=None):
        log_probs = np.asarray(log_probs)
        B, T, _ = log_probs.shape
        n = (
            np.full((B,), T, np.int32) if lens is None
            else np.round(np.asarray(lens) * T).astype(np.int32)
        )
        # one vmapped Viterbi program over the whole batch
        results = intersect_viterbi_batch(log_probs, n, self.graph)
        return [[self.id2word[o] for o in ol] for _, ol in results]


class NBestDecoder:
    """K-best HLG decoding with optional n-gram rescoring (the native
    analogue of the reference's ``nbest`` / ``nbest-rescoring`` methods,
    ref lattice_decoder.py:453 — exact top-k paths instead of k2's
    random path sampling).

    Arguments
    ---------
    lexicon : .lexicon.Lexicon
    G_lm : optional word n-gram used INSIDE the decoding graph.
    num_paths : k.
    rescore_lm : optional lm.ngram.BackoffNgramLM-style word LM applied
        to the k-best word sequences (``nbest-rescoring``).
    lm_scale : weight of the rescoring LM log-probability.
    """

    def __init__(self, lexicon, G_lm=None, num_paths=8, rescore_lm=None,
                 lm_scale=1.0):
        self.graph, word2id = compile_HLG(lexicon, G_lm)
        self.id2word = {i: w for w, i in word2id.items()}
        self.num_paths = num_paths
        self.rescore_lm = rescore_lm
        self.lm_scale = lm_scale

    def _lm_logprob(self, words):
        lm = self.rescore_lm
        seq = ["<s>", *words, "</s>"]
        total = 0.0
        for j in range(1, len(seq)):
            context = tuple(seq[max(0, j - lm.top_order + 1): j])
            total += lm.logprob(seq[j], context)
        return total

    def decode(self, log_probs, lens=None, return_nbest=False):
        log_probs = np.asarray(log_probs)
        B, T, _ = log_probs.shape
        best, nbest = [], []
        for b in range(B):
            n = T if lens is None else int(round(float(lens[b]) * T))
            paths = intersect_kbest(
                log_probs[b], n, self.graph, self.num_paths
            )
            scored = []
            for am_score, olabels in paths:
                words = [self.id2word[o] for o in olabels]
                total = am_score
                if self.rescore_lm is not None:
                    total += self.lm_scale * self._lm_logprob(words)
                scored.append((total, words))
            scored.sort(key=lambda x: -x[0])
            nbest.append(scored)
            best.append(scored[0][1] if scored else [])
        if return_nbest:
            return best, nbest
        return best


def get_decoding(decoding_method="1best", lexicon=None, G_lm=None,
                 num_paths=8, rescore_lm=None, lm_scale=1.0, **kwargs):
    """Factory matching the reference surface (lattice_decoder.py:54):
    returns a dict with a ``decoding_method`` callable. Methods:

    * ``1best`` — batched Viterbi over H∘L(∘G).
    * ``nbest`` — exact top-k paths, best emitted.
    * ``nbest-rescoring`` — top-k paths re-ranked by ``rescore_lm``.
    * ``whole-lattice-rescoring`` — the reference swaps the lattice's LM
      scores for a full-context G (ref lattice_decoder.py:453); natively
      the same G (scaled by ``lm_scale``) is composed INTO the decoding
      graph, which scores every lattice path with G exactly — no n-best
      truncation.
    """
    if lexicon is None:
        raise ValueError("get_decoding needs a prepared Lexicon")
    if decoding_method == "1best":
        decoder = OneBestDecoder(lexicon, G_lm)
    elif decoding_method == "nbest":
        decoder = NBestDecoder(lexicon, G_lm, num_paths=num_paths)
    elif decoding_method == "nbest-rescoring":
        if rescore_lm is None:
            raise ValueError("nbest-rescoring needs rescore_lm")
        decoder = NBestDecoder(
            lexicon, G_lm, num_paths=num_paths, rescore_lm=rescore_lm,
            lm_scale=lm_scale,
        )
    elif decoding_method == "whole-lattice-rescoring":
        if rescore_lm is None:
            raise ValueError("whole-lattice-rescoring needs rescore_lm")
        scaled = _ScaledLM(rescore_lm, lm_scale)
        decoder = OneBestDecoder(lexicon, scaled)
    else:
        raise NotImplementedError(
            f"decoding_method={decoding_method!r}"
        )

    def decoding_function(log_probs, lens=None, **_):
        return decoder.decode(log_probs, lens)

    return {"decoding_method": decoding_function, "decoder": decoder}


class _ScaledLM:
    """Wrap a BackoffNgramLM-style LM, scaling every log-probability —
    the ``lm_scale`` of whole-lattice rescoring applied at graph-build
    time (ngram_fsa reads ``logprob``/``top_order``)."""

    def __init__(self, lm, scale):
        self._lm = lm
        self._scale = scale
        self.top_order = lm.top_order

    def logprob(self, word, context=()):
        return self._scale * self._lm.logprob(word, context)

    def __getattr__(self, name):
        return getattr(self._lm, name)


def get_lattice(log_probs, lens, graph):
    """One-utterance Viterbi intersection (score, olabels) — the
    native stand-in for the reference's lattice construction
    (lattice_decoder.py:453)."""
    return intersect_viterbi(np.asarray(log_probs), int(lens), graph)
