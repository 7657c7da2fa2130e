"""n-gram counting utilities.

Capability parity with the reference's ``speechbrain/lm/counting.py``
(ngrams, ngrams_for_evaluation, pad_ends).
"""

import itertools


def pad_ends(sequence, pad_left=True, left_pad_symbol="<s>", right_pad_symbol="</s>"):
    """Add sentence boundary symbols.

    Example
    -------
    >>> list(pad_ends(["a", "b"]))
    ['<s>', 'a', 'b', '</s>']
    """
    if pad_left:
        return itertools.chain(
            (left_pad_symbol,), sequence, (right_pad_symbol,)
        )
    return itertools.chain(sequence, (right_pad_symbol,))


def ngrams(sequence, n):
    """Produce all n-grams lazily.

    Example
    -------
    >>> list(ngrams(["a", "b", "c"], 2))
    [('a', 'b'), ('b', 'c')]
    """
    if n <= 0:
        raise ValueError("n must be >= 1")
    window = []
    for token in sequence:
        window.append(token)
        if len(window) == n:
            yield tuple(window)
            window.pop(0)


def ngrams_for_evaluation(sequence, max_n, predict_first=False):
    """Yield (token, context) pairs with growing context up to max_n-1.

    Example
    -------
    >>> list(ngrams_for_evaluation(["a", "b", "c"], 2))
    [('b', ('a',)), ('c', ('b',))]
    """
    seq = list(sequence)
    start = 0 if predict_first else 1
    for i in range(start, len(seq)):
        context = tuple(seq[max(0, i - (max_n - 1)) : i])
        yield seq[i], context
