"""Pallas TPU kernels (fused mel frontend, flash attention), each with
a jnp reference path and an ``interpret`` mode for CPU testing.

STATUS — measured on v5e and auto-dispatched accordingly: at every
production shape in this toolkit, plain XLA beats these hand-written
kernels (fused fbank 165k vs 247k audio-s/s unfused; flash attention
2.25 ms vs XLA 1.77 ms at the conformer shapes — XLA's fusion and
flash-style attention lowering already cover them). The kernels are
kept as working Pallas references and for shapes where the dispatch
heuristics choose them, but the performance-critical paths in this
toolkit intentionally ride XLA: the hot-loop wins that actually moved
the serving numbers were algorithmic/layout changes expressed IN XLA
(one-hot MXU gathers and associative log-scans in the CTC prefix
scorer, KV-cached decode steps, lane-aligned sequence padding) — see
decoders/ctc.py and README performance notes.
"""
