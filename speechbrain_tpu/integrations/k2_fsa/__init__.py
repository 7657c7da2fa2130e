"""FSA-based lexicon/graph tooling (reference
``speechbrain/integrations/k2_fsa/``).

The reference builds on the k2 C++/CUDA FSA library. Here the whole
surface is native: lexicon handling, lang-dir preparation with
disambiguation symbols, L-FST construction (OpenFST text format), CTC
training-graph compilation, CTC forced alignment, HLG composition with
epsilon removal (:mod:`.fsa`), jitted one-best lattice decoding
(:mod:`.lattice_decoder.OneBestDecoder`) and differentiable LF-MMI
(:func:`.losses.mmi_loss`) — no k2 wheel required.
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

from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (  # noqa: F401,E402
    OneBestDecoder,
    compile_HLG,
    get_decoding,
)
from speechbrain_tpu.integrations.k2_fsa.losses import (  # noqa: F401,E402
    MmiGraphs,
    ctc_k2,
    mmi_loss,
)
