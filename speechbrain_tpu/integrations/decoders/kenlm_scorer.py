"""Word-level n-gram LM scorer for CTC beam decoding.

Capability parity with the reference's
``speechbrain/integrations/decoders/kenlm_scorer.py`` (KenlmScorer at
kenlm_scorer.py:187, load_unigram_set_from_arpa at :47). The reference
wraps the kenlm C++ library; kenlm is not bundled here, so the default
backend is the framework's own pure-python :class:`BackoffNgramLM`
loaded from ARPA — same scoring surface (``get_start_state``,
``score(state, word, is_last_word)``, ``score_partial_token``,
alpha/beta shallow fusion in ln space). When kenlm IS installed, pass a
``kenlm.Model`` and it is used directly.
"""

import math
from typing import Optional

from speechbrain_tpu.lm.arpa import read_arpa
from speechbrain_tpu.lm.ngram import BackoffNgramLM

LN10 = math.log(10.0)


def load_unigram_set_from_arpa(arpa_path):
    """Read the unigram vocabulary out of an ARPA file
    (reference kenlm_scorer.py:47)."""
    with open(arpa_path, encoding="utf-8") as f:
        num_grams, ngrams, backoffs = read_arpa(f)
    unigrams = {gram[0] for gram in ngrams.get(1, {})}
    return {w for w in unigrams if w not in ("<s>", "</s>", "<unk>")}


class NgramLMState:
    """Opaque LM state: the word-history context tuple."""

    __slots__ = ("context",)

    def __init__(self, context=()):
        self.context = tuple(context)


class NgramScorer:
    """Stateful word-LM scorer over an ARPA model for beam decoding
    (reference KenlmScorer at kenlm_scorer.py:187).

    Example
    -------
    >>> import io, textwrap
    >>> arpa = io.StringIO(textwrap.dedent('''\\
    ...     \\\\data\\\\
    ...     ngram 1=4
    ...     ngram 2=1
    ...
    ...     \\\\1-grams:
    ...     -1.0 <s> -1.0
    ...     -1.0 </s> -1.0
    ...     -1.0 Hello -0.23
    ...     -0.7 world -0.25
    ...
    ...     \\\\2-grams:
    ...     -0.3 Hello world
    ...
    ...     \\\\end\\\\'''))
    >>> scorer = NgramScorer.from_arpa_stream(arpa, unigrams=["Hello", "world"],
    ...                                       alpha=1.0, beta=0.0)
    >>> state = scorer.get_start_state()
    >>> score, state2 = scorer.score(state, "Hello")
    >>> score < 0
    True
    >>> s2, _ = scorer.score(state2, "world")
    >>> s_cold, _ = scorer.score(scorer.get_start_state(), "world")
    >>> s2 > s_cold  # bigram "Hello world" beats unigram backoff
    True
    """

    def __init__(self, lm: BackoffNgramLM, unigrams=None, alpha=0.5,
                 beta=1.5, unk_score_offset=-10.0, score_boundary=True,
                 max_order=5):
        self.lm = lm
        self.alpha = alpha
        self.beta = beta
        self.unk_score_offset = unk_score_offset
        self.score_boundary = score_boundary
        self.max_order = max_order
        self._unigram_set = set(unigrams) if unigrams else set()
        self._prefixes = set()
        for w in self._unigram_set:
            for i in range(1, len(w) + 1):
                self._prefixes.add(w[:i])

    @classmethod
    def from_arpa(cls, arpa_path, **kwargs):
        with open(arpa_path, encoding="utf-8") as f:
            return cls.from_arpa_stream(f, **kwargs)

    @classmethod
    def from_arpa_stream(cls, stream, **kwargs):
        num_grams, ngrams, backoffs = read_arpa(stream)
        lm = BackoffNgramLM(ngrams, backoffs)
        kwargs.setdefault("max_order", max(num_grams) if num_grams else 5)
        return cls(lm, **kwargs)

    def get_start_state(self):
        """Initial LM state (sentence-boundary context when enabled)."""
        return NgramLMState(("<s>",) if self.score_boundary else ())

    def _logprob10(self, word, context):
        # walk down shorter contexts until the LM can score
        for i in range(len(context) + 1):
            try:
                return self.lm.logprob(word, context[i:])
            except KeyError:
                continue
        return None

    def score_partial_token(self, partial_token):
        """OOV penalty for an in-progress word (reference :285)."""
        is_oov = 1.0
        if self._prefixes and partial_token in self._prefixes:
            is_oov = 0.0
        unk_score = self.unk_score_offset * is_oov
        if len(partial_token) > 6:
            unk_score = unk_score * len(partial_token) / 6
        return unk_score

    def score(self, prev_state, word, is_last_word=False):
        """ln-space shallow-fusion score of ``word`` given the state;
        returns ``(score, new_state)``."""
        if not isinstance(prev_state, NgramLMState):
            raise AssertionError(
                f"Expected NgramLMState, got {type(prev_state)}"
            )
        ctx = prev_state.context
        lp = self._logprob10(word, ctx)
        if lp is None or (self._unigram_set
                          and word not in self._unigram_set):
            lp = (lp or 0.0) + self.unk_score_offset
        if is_last_word and self.score_boundary:
            end_ctx = (ctx + (word,))[-(self.max_order - 1):]
            lp_end = self._logprob10("</s>", end_ctx)
            lp += lp_end if lp_end is not None else 0.0
        new_ctx = (ctx + (word,))[-(self.max_order - 1):]
        return self.alpha * lp * LN10 + self.beta, NgramLMState(new_ctx)


def KenlmScorer(kenlm_model=None, unigrams=None, alpha=0.5, beta=1.5,
                unk_score_offset=-10.0, score_boundary=True):
    """Reference-compatible constructor: with a real ``kenlm.Model`` this
    wraps kenlm; otherwise raises pointing at :class:`NgramScorer`."""
    try:
        import kenlm  # noqa: F401
    except ImportError:
        raise ImportError(
            "kenlm is not installed; use NgramScorer.from_arpa(...) for the "
            "built-in ARPA-backed scorer with the same interface."
        )
    return _KenlmBackend(kenlm_model, unigrams, alpha, beta,
                         unk_score_offset, score_boundary)


class _KenlmBackend:
    """Thin kenlm-backed scorer (only constructed when kenlm exists)."""

    def __init__(self, model, unigrams, alpha, beta, unk_score_offset,
                 score_boundary):
        import kenlm

        self._kenlm = kenlm
        self.model = model
        self.alpha = alpha
        self.beta = beta
        self.unk_score_offset = unk_score_offset
        self.score_boundary = score_boundary
        self._unigram_set = set(unigrams) if unigrams else set()

    def get_start_state(self):
        st = self._kenlm.State()
        if self.score_boundary:
            self.model.BeginSentenceWrite(st)
        else:
            self.model.NullContextWrite(st)
        return st

    def score(self, prev_state, word, is_last_word=False):
        end = self._kenlm.State()
        lp = self.model.BaseScore(prev_state, word, end)
        if (self._unigram_set and word not in self._unigram_set) or (
            word not in self.model
        ):
            lp += self.unk_score_offset
        if is_last_word and self.score_boundary:
            fin = self._kenlm.State()
            lp += self.model.BaseScore(end, "</s>", fin)
        return self.alpha * lp * LN10 + self.beta, end
