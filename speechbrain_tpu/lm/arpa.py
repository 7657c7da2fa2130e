"""ARPA n-gram file reading/writing.

Capability parity with the reference's ``speechbrain/lm/arpa.py``
(read_arpa :73, arpa_to_fst :242 — the FST path targets k2; here the
dense-tensor export ``arpa_to_dense`` serves the same role for on-device
n-gram fusion).
"""

import math
from collections import defaultdict

import numpy as np


def read_arpa(fstream):
    """Parse an ARPA file from a stream.

    Returns
    -------
    num_grams : dict order -> count
    ngrams : dict order -> {context tuple -> {token: (logp, )}}...
        Here: dict order -> dict ngram-tuple -> logp (base 10)
    backoffs : dict ngram-tuple -> backoff logp

    Example
    -------
    >>> import io
    >>> bs = chr(92)  # backslash, kept out of the docstring escaping
    >>> arpa = io.StringIO(chr(10).join([
    ...     bs + "data" + bs, "ngram 1=2", "ngram 2=1", "",
    ...     bs + "1-grams:", "-0.5 a -0.3", "-0.7 b", "",
    ...     bs + "2-grams:", "-0.2 a b", "", bs + "end" + bs,
    ... ]))
    >>> num, ngrams, backoffs = read_arpa(arpa)
    >>> num[1], ngrams[1][("a",)], backoffs[("a",)]
    (2, -0.5, -0.3)
    """
    num_grams = {}
    ngrams = defaultdict(dict)
    backoffs = {}
    section = None
    for line in fstream:
        line = line.strip()
        if not line:
            continue
        if line.startswith("\\data"):
            section = "data"
            continue
        if line.startswith("\\end"):
            break
        if line.startswith("\\") and "-grams:" in line:
            section = int(line[1 : line.index("-")])
            continue
        if section == "data":
            if line.startswith("ngram"):
                order, count = line[len("ngram") :].split("=")
                num_grams[int(order.strip())] = int(count.strip())
            continue
        if isinstance(section, int):
            parts = line.split("\t") if "\t" in line else line.split()
            logp = float(parts[0])
            if "\t" in line:
                tokens = tuple(parts[1].split())
                backoff = float(parts[2]) if len(parts) > 2 else None
            else:
                tokens = tuple(parts[1 : 1 + section])
                backoff = (
                    float(parts[1 + section])
                    if len(parts) > 1 + section
                    else None
                )
            ngrams[section][tokens] = logp
            if backoff is not None:
                backoffs[tokens] = backoff
    return num_grams, dict(ngrams), backoffs


def write_arpa(fstream, num_grams, ngrams, backoffs):
    """Write an ARPA file (inverse of read_arpa)."""
    fstream.write("\\data\\\n")
    for order in sorted(num_grams):
        fstream.write(f"ngram {order}={num_grams[order]}\n")
    fstream.write("\n")
    for order in sorted(ngrams):
        fstream.write(f"\\{order}-grams:\n")
        for tokens, logp in ngrams[order].items():
            line = f"{logp}\t{' '.join(tokens)}"
            if tokens in backoffs:
                line += f"\t{backoffs[tokens]}"
            fstream.write(line + "\n")
        fstream.write("\n")
    fstream.write("\\end\\\n")


def arpa_to_dense(path_or_stream, token_to_id, vocab_size, max_order=None):
    """Convert an ARPA LM over a finite vocab to dense score tensors for
    on-device fusion: for a bigram LM returns (unigram (V,), bigram (V, V))
    log10 scores with backoff applied — the jit-safe replacement for the
    reference's kenlm/k2 paths."""
    if hasattr(path_or_stream, "read"):
        num, ngrams, backoffs = read_arpa(path_or_stream)
    else:
        with open(path_or_stream, encoding="utf-8") as f:
            num, ngrams, backoffs = read_arpa(f)
    max_order = max_order or max(num)
    if max_order > 2:
        raise ValueError("Dense export supports order <= 2; use BackoffNgramLM")
    uni = np.full((vocab_size,), -99.0, np.float32)
    for (tok,), logp in ngrams.get(1, {}).items():
        if tok in token_to_id:
            uni[token_to_id[tok]] = logp
    if max_order == 1:
        return uni
    bo = np.zeros((vocab_size,), np.float32)
    for (tok,), b in backoffs.items():
        if tok in token_to_id:
            bo[token_to_id[tok]] = b
    bi = uni[None, :] + bo[:, None]  # backoff default
    for (t1, t2), logp in ngrams.get(2, {}).items():
        if t1 in token_to_id and t2 in token_to_id:
            bi[token_to_id[t1], token_to_id[t2]] = logp
    return uni, bi
