"""Training-graph compilation.

Capability parity with the reference's
``speechbrain/integrations/k2_fsa/graph_compiler.py`` (GraphCompiler at
graph_compiler.py:29, CtcGraphCompiler at :220). For CTC the
transcript-specific training graph is exactly the standard CTC
alignment lattice, which XLA evaluates directly inside
:func:`speechbrain_tpu.nnet.losses.ctc_loss` — so the native compiler
produces padded token-id targets for that loss instead of a k2 FSA.
HLG construction (composition with an n-gram G) requires k2 and is
gated.
"""

import abc

import numpy as np

from speechbrain_tpu.integrations.k2_fsa.lexicon import Lexicon


class GraphCompiler(abc.ABC):
    """Base: compile transcripts into training targets/graphs
    (reference graph_compiler.py:29)."""

    @property
    @abc.abstractmethod
    def lexicon(self):
        ...

    @abc.abstractmethod
    def compile(self, texts):
        ...


class CtcGraphCompiler(GraphCompiler):
    """Compile texts into padded CTC targets + lengths
    (reference CtcGraphCompiler at graph_compiler.py:220).

    ``compile(texts)`` returns ``(targets (B, U) int32 padded with
    blank, target_lens (B,) relative)`` — directly consumable by
    :func:`speechbrain_tpu.nnet.losses.ctc_loss`.

    Example
    -------
    >>> import os, tempfile
    >>> from speechbrain_tpu.integrations.k2_fsa.prepare_lang import (
    ...     prepare_lang,
    ... )
    >>> d = tempfile.mkdtemp()
    >>> with open(os.path.join(d, "lexicon.txt"), "w") as f:
    ...     _ = f.write("hi h i\\nyo y o\\n")
    >>> prepare_lang(d)
    >>> compiler = CtcGraphCompiler(Lexicon(d))
    >>> tgt, lens = compiler.compile(["hi yo", "hi"])
    >>> tgt.shape[0], float(lens[0])
    (2, 1.0)
    """

    def __init__(self, lexicon: Lexicon, device=None, oov="<UNK>"):
        self._lexicon = lexicon
        self.oov = oov
        # contiguous CTC output ids: 0 = blank, then real tokens
        toks = self._lexicon.tokens
        self.token2ctc = {t: i + 1 for i, t in enumerate(toks)}
        self.vocab_size = len(toks) + 1

    @property
    def lexicon(self):
        return self._lexicon

    def compile(self, texts):
        import jax.numpy as jnp

        seqs = [
            [self.token2ctc[t] for t in ids]
            for ids in self._lexicon.texts_to_token_ids(
                texts, oov_token=self.oov
            )
        ]
        U = max((len(s) for s in seqs), default=1)
        tgt = np.zeros((len(seqs), max(U, 1)), np.int32)
        lens = np.zeros((len(seqs),), np.float32)
        for i, s in enumerate(seqs):
            tgt[i, : len(s)] = s
            lens[i] = len(s) / max(U, 1)
        return jnp.asarray(tgt), jnp.asarray(lens)

    def compile_HLG(self, G_lm=None, semiring="max"):
        """Eps-free HLG decoding graph via the native FSA toolkit
        (lattice_decoder.compile_HLG; the reference builds this with k2,
        graph_compiler.py:98). ``G_lm`` is an optional word n-gram LM
        (lm.ngram.BackoffNgramLM-style)."""
        from speechbrain_tpu.integrations.k2_fsa.lattice_decoder import (
            compile_HLG,
        )

        graph, _ = compile_HLG(self._lexicon, G_lm, semiring=semiring)
        return graph
