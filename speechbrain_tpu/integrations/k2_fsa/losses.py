"""Graph-based losses.

Capability parity with the reference's
``speechbrain/integrations/k2_fsa/losses.py`` (ctc_k2 at losses.py:17):
the reference routes CTC through k2's dense-FSA intersection; on TPU the
same objective is the XLA CTC loss, so ``ctc_k2`` delegates to
:func:`speechbrain_tpu.nnet.losses.ctc_loss` with the compiler's
targets. MMI/LF-MMI requires k2 lattices and raises when k2 is absent.
"""

from speechbrain_tpu.nnet.losses import ctc_loss


def ctc_k2(log_probs, input_lens, graph_compiler, texts,
           reduction="mean", beam_size=10, use_double_scores=True,
           is_training=True):
    """CTC objective over compiled transcript graphs
    (reference losses.py:17). ``beam_size``/``use_double_scores`` exist
    for signature parity; exact CTC needs no beam."""
    targets, target_lens = graph_compiler.compile(texts)
    return ctc_loss(
        log_probs, targets, input_lens, target_lens,
        blank_index=0, reduction=reduction,
    )


class MmiGraphs:
    """Numerator/denominator graphs for LF-MMI (the native stand-in for
    the reference's k2 graph compiler, ref losses.py:134): the
    denominator is the full CTC-topology ∘ lexicon (∘ G) graph; per-
    utterance numerators are CTC topology ∘ linear transcript FSAs."""

    def __init__(self, lexicon, G_lm=None):
        from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
            compile_HLG,
        )

        self.lexicon = lexicon
        self.den_graph, _ = compile_HLG(
            lexicon, G_lm, semiring="log"
        )
        self._tok2emit = {
            t: i + 1 for i, t in enumerate(lexicon.tokens)
        }
        self._num_cache = {}

    def numerator(self, text):
        from speechbrain_tpu.integrations.k2_fsa.fsa import (
            compose,
            ctc_topo,
            linear_fsa,
            remove_eps_input,
        )

        if text not in self._num_cache:
            ids = [
                self._tok2emit[t]
                for t in self.lexicon.texts_to_token_ids([text])[0]
            ]
            g = compose(ctc_topo(len(self.lexicon.tokens)),
                        linear_fsa(ids))
            self._num_cache[text] = remove_eps_input(g, semiring="log")
        return self._num_cache[text]


def mmi_loss(log_probs, input_lens, graphs, texts, reduction="mean",
             den_scale=1.0):
    """Maximum-mutual-information objective (reference losses.py:134):
    ``-(log p(num paths) - den_scale * log p(den paths))`` per
    utterance via differentiable dense forward intersections
    (fsa.intersect_forward) — gradients flow into ``log_probs``.

    Arguments
    ---------
    log_probs : (B, T, V) CTC log-posteriors (V = blank + tokens).
    input_lens : (B,) relative lengths.
    graphs : MmiGraphs
    texts : list of transcripts (one per batch row).
    """
    import jax.numpy as jnp

    from speechbrain_tpu.integrations.k2_fsa.fsa import intersect_forward

    T = log_probs.shape[1]
    losses = []
    for b, text in enumerate(texts):
        n = jnp.round(input_lens[b] * T).astype(jnp.int32)
        num = intersect_forward(log_probs[b], n, graphs.numerator(text))
        den = intersect_forward(log_probs[b], n, graphs.den_graph)
        losses.append(-(num - den_scale * den))
    losses = jnp.stack(losses)
    if reduction == "mean":
        return jnp.mean(losses)
    return losses
