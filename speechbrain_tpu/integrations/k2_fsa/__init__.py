"""FSA-based lexicon/graph tooling (reference
``speechbrain/integrations/k2_fsa/``).

The reference builds on the k2 C++/CUDA FSA library. Here the
dependency-free parts — lexicon handling, lang-dir preparation with
disambiguation symbols, L-FST construction (OpenFST text format), CTC
training-graph compilation and CTC forced alignment — are implemented
natively; full lattice decoding (HLG composition, n-best rescoring)
requires k2 and raises with a pointer when it is absent.
"""

from speechbrain_tpu.integrations.k2_fsa.lexicon import (  # noqa: F401
    Lexicon,
    prepare_char_lexicon,
    read_lexicon,
    write_lexicon,
)
from speechbrain_tpu.integrations.k2_fsa.prepare_lang import (  # noqa: F401
    add_disambig_symbols,
    prepare_lang,
)
