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
    intersect_viterbi,
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
        out = []
        for b in range(B):
            n = T if lens is None else int(round(float(lens[b]) * T))
            _, olabels = intersect_viterbi(log_probs[b], n, self.graph)
            out.append([self.id2word[o] for o in olabels])
        return out


def get_decoding(decoding_method="1best", lexicon=None, G_lm=None,
                 **kwargs):
    """Factory matching the reference surface (lattice_decoder.py:54):
    returns a dict with a ``decoding_method`` callable."""
    if decoding_method != "1best":
        raise NotImplementedError(
            f"decoding_method={decoding_method!r}: only 1best is "
            "implemented natively (n-best rescoring goes through "
            "decoders.scorer.RescorerBuilder)"
        )
    if lexicon is None:
        raise ValueError("get_decoding needs a prepared Lexicon")
    decoder = OneBestDecoder(lexicon, G_lm)

    def decoding_function(log_probs, lens=None, **_):
        return decoder.decode(log_probs, lens)

    return {"decoding_method": decoding_function, "decoder": decoder}


def get_lattice(log_probs, lens, graph):
    """One-utterance Viterbi intersection (score, olabels) — the
    native stand-in for the reference's lattice construction
    (lattice_decoder.py:453)."""
    return intersect_viterbi(np.asarray(log_probs), int(lens), graph)
