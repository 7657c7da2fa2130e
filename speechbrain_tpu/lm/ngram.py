"""Backoff n-gram language model + perplexity evaluation.

Capability parity with the reference's ``speechbrain/lm/ngram.py``
(BackoffNgramLM :13, ngram_evaluation_details :111, ngram_perplexity :180).
"""

import math


class BackoffNgramLM:
    """Query a backoff n-gram LM loaded from ARPA data
    (reference lm/ngram.py:13).

    Arguments
    ---------
    ngrams : dict order -> {ngram tuple -> log10 prob}
    backoffs : dict context tuple -> log10 backoff weight

    Example
    -------
    >>> ngrams = {1: {("a",): -0.5, ("b",): -0.7}, 2: {("a", "b"): -0.2}}
    >>> lm = BackoffNgramLM(ngrams, {("a",): -0.3})
    >>> round(lm.logprob("b", context=("a",)), 2)
    -0.2
    >>> round(lm.logprob("a", context=("b",)), 2)  # backoff to unigram
    -0.5
    """

    def __init__(self, ngrams, backoffs):
        self.ngrams = ngrams
        self.backoffs = backoffs
        self.top_order = max(ngrams)

    def logprob(self, token, context=()):
        context = tuple(context)
        if len(context) >= self.top_order:
            context = context[-(self.top_order - 1) :] if self.top_order > 1 else ()
        order = len(context) + 1
        ngram = context + (token,)
        if order in self.ngrams and ngram in self.ngrams[order]:
            return self.ngrams[order][ngram]
        if not context:
            return float("-inf")
        backoff = self.backoffs.get(context, 0.0)
        return backoff + self.logprob(token, context[1:])


def ngram_evaluation_details(data, LM):
    """Per-sentence log-prob details (reference lm/ngram.py:111).

    data: iterable of token lists (with BOS handled by the caller).
    """
    details = []
    for sentence in data:
        logprob = 0.0
        count = 0
        context = ()
        for token in sentence:
            lp = LM.logprob(token, context)
            logprob += lp
            count += 1
            context = context + (token,)
        details.append({"logprob": logprob, "num_tokens": count})
    return details


def ngram_perplexity(eval_details, logbase=10.0):
    """Corpus perplexity from evaluation details (reference lm/ngram.py:180).

    Example
    -------
    >>> details = [{"logprob": -3, "num_tokens": 3}]
    >>> round(ngram_perplexity(details), 1)
    10.0
    """
    tot_logprob = sum(d["logprob"] for d in eval_details)
    num_tokens = sum(d["num_tokens"] for d in eval_details)
    return logbase ** (-tot_logprob / num_tokens)
