"""BLEU score.

Capability parity with the reference's bleu shim (which wraps sacrebleu):
uses sacrebleu when installed, else a from-scratch corpus BLEU-4 with the
standard brevity penalty.
"""

import collections
import math

from speechbrain_tpu.utils.metric_stats import MetricStats


def _ngrams(tokens, n):
    return collections.Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def corpus_bleu(hypotheses, references, max_n=4):
    """Corpus BLEU over token lists.

    Example
    -------
    >>> round(corpus_bleu([["a", "b", "c", "d"]], [[["a", "b", "c", "d"]]]), 2)
    100.0
    """
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hypotheses, references):
        hyp_len += len(hyp)
        # closest reference length
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            hyp_ng = _ngrams(hyp, n)
            max_ref = collections.Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            clipped[n - 1] += sum(
                min(c, max_ref.get(ng, 0)) for ng, c in hyp_ng.items()
            )
    if min(totals) == 0 or min(clipped) == 0:
        return 0.0
    log_prec = sum(
        math.log(c / t) for c, t in zip(clipped, totals)
    ) / max_n
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return 100.0 * bp * math.exp(log_prec)


class BLEUStats(MetricStats):
    """Accumulatable BLEU (reference utils/bleu.py BLEUStats)."""

    def __init__(self, lang="en", merge_words=True):
        self.clear()
        self.merge_words = merge_words

    def clear(self):
        self.ids = []
        self.predicts = []
        self.targets = []
        self.summary = {}

    def append(self, ids, predict, targets):
        self.ids.extend(ids)
        self.predicts.extend(predict)
        # targets: list (num_refs) of list (batch) of sentences
        if not self.targets:
            self.targets = [[] for _ in targets]
        for i, ref_set in enumerate(targets):
            self.targets[i].extend(ref_set)

    def summarize(self, field=None):
        try:
            import sacrebleu

            hyps = [
                " ".join(h) if isinstance(h, list) else h for h in self.predicts
            ]
            refs = [
                [" ".join(r) if isinstance(r, list) else r for r in ref_set]
                for ref_set in self.targets
            ]
            score = sacrebleu.corpus_bleu(hyps, refs).score
        except ImportError:
            hyp_tok = [
                h.split() if isinstance(h, str) else list(h) for h in self.predicts
            ]
            refs_per_hyp = [
                [
                    (self.targets[r][i].split()
                     if isinstance(self.targets[r][i], str)
                     else list(self.targets[r][i]))
                    for r in range(len(self.targets))
                ]
                for i in range(len(hyp_tok))
            ]
            score = corpus_bleu(hyp_tok, refs_per_hyp)
        self.summary = {"BLEU": score}
        if field is not None:
            return self.summary[field]
        return self.summary
