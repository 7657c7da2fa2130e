"""Lattice decoding (reference
``speechbrain/integrations/k2_fsa/lattice_decoder.py``).

One-best and n-best lattice decoding over HLG graphs requires the k2
library (C++ FSA intersection), which is not bundled. First-pass CTC
decoding is available natively via
:mod:`speechbrain_tpu.decoders.ctc` (greedy + prefix beam search), and
word-LM shallow fusion via
:mod:`speechbrain_tpu.integrations.decoders.kenlm_scorer.NgramScorer`.
"""


def get_decoding(decoding_method="1best", **kwargs):
    """Factory matching the reference surface; requires k2."""
    try:
        import k2  # noqa: F401
    except ImportError:
        raise ImportError(
            "Lattice decoding requires the k2 library, which is not "
            "installed. Use speechbrain_tpu.decoders.ctc.CTCBeamSearcher "
            "for first-pass decoding instead."
        )
    raise NotImplementedError(
        "k2-backed lattice decoding is not wired up in this build."
    )


def get_lattice(*args, **kwargs):
    """See :func:`get_decoding`."""
    return get_decoding(*args, **kwargs)
