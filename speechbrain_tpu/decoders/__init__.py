"""Decoding: CTC greedy/beam, seq2seq greedy/beam search with pluggable
LM-fusion scorers, transducer search."""

from speechbrain_tpu.decoders.ctc import ctc_greedy_decode, filter_ctc_output  # noqa: F401
from speechbrain_tpu.decoders.seq2seq import (  # noqa: F401
    S2SBeamSearcher,
    S2SGreedySearcher,
)
