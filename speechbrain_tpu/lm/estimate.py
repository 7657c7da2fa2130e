"""Native n-gram LM estimation (the reference's
``recipes/LibriSpeech/LM/train_ngram.py`` shells out to kenlm's
``lmplz``; this module estimates a backoff model in-process so no C++
dependency is needed).

Witten-Bell smoothing: the discounted probability of an n-gram is
``c(w|h) / (c(h) + N1+(h))`` and the backoff mass of a history is
``N1+(h) / (c(h) + N1+(h))``, where ``N1+(h)`` counts distinct
continuations of ``h``. Produces the ``{order: {ngram tuple: log10 p}}``
/ ``{context tuple: log10 bo}`` structures consumed by
:class:`speechbrain_tpu.lm.ngram.BackoffNgramLM` and
:func:`speechbrain_tpu.lm.arpa.write_arpa`.

Example
-------
>>> probs, backoffs = estimate_backoff_ngram(
...     [["a", "b"], ["a", "b", "c"]], order=2)
>>> ("a", "b") in probs[2]
True
>>> from speechbrain_tpu.lm.ngram import BackoffNgramLM
>>> lm = BackoffNgramLM(probs, backoffs)
>>> lm.logprob("b", context=("a",)) > lm.logprob("c", context=("a",))
True
"""

import math
from collections import Counter, defaultdict

from speechbrain_tpu.lm.counting import ngrams, pad_ends


def estimate_backoff_ngram(sentences, order=3, bos="<s>", eos="</s>"):
    """Estimate a Witten-Bell-smoothed backoff n-gram model.

    Arguments
    ---------
    sentences : iterable of token lists (str tokens).
    order : highest n-gram order.
    bos, eos : sentence boundary symbols.

    Returns
    -------
    (probs, backoffs):
        probs[n] = {ngram tuple: log10 probability}
        backoffs = {context tuple: log10 backoff weight}
    """
    counts = {n: defaultdict(Counter) for n in range(1, order + 1)}
    for sent in sentences:
        padded = list(
            pad_ends(sent, left_pad_symbol=bos, right_pad_symbol=eos)
        )
        for n in range(1, order + 1):
            for gram in ngrams(padded, n):
                counts[n][tuple(gram[:-1])][gram[-1]] += 1

    probs = {n: {} for n in range(1, order + 1)}
    backoffs = {}
    for n in range(1, order + 1):
        for context, followers in counts[n].items():
            total = sum(followers.values())
            distinct = len(followers)
            denom = total + distinct
            for token, c in followers.items():
                probs[n][context + (token,)] = math.log10(c / denom)
            if context:
                # mass reserved for unseen continuations of this
                # context — the ARPA backoff weight lives on the
                # (n-1)-gram line of the context itself
                backoffs[context] = math.log10(
                    max(distinct / denom, 1e-12)
                )
    return probs, backoffs


def arpa_counts(probs):
    """Number of n-grams per order, for the ARPA \\data\\ header."""
    return {n: len(grams) for n, grams in probs.items()}


def train_ngram_arpa(sentences, out_path, order=3):
    """Estimate and write an ARPA file; returns the model structures."""
    from speechbrain_tpu.lm.arpa import write_arpa

    probs, backoffs = estimate_backoff_ngram(sentences, order=order)
    with open(out_path, "w", encoding="utf-8") as f:
        write_arpa(f, arpa_counts(probs), probs, backoffs)
    return probs, backoffs
