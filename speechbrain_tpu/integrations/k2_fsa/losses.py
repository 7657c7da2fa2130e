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


def mmi_loss(*args, **kwargs):
    """Lattice-free MMI needs k2's FSA intersection."""
    try:
        import k2  # noqa: F401
    except ImportError:
        raise ImportError(
            "MMI loss requires the k2 library, which is not installed."
        )
    raise NotImplementedError(
        "k2-backed MMI is not wired up in this build."
    )
