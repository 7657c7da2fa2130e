"""Native Witten-Bell n-gram estimation (lm/estimate.py — replaces the
reference's kenlm lmplz dependency in recipes/LibriSpeech/LM)."""

import math

from speechbrain_tpu.lm.estimate import (
    arpa_counts,
    estimate_backoff_ngram,
    train_ngram_arpa,
)
from speechbrain_tpu.lm.ngram import (
    BackoffNgramLM,
    ngram_evaluation_details,
    ngram_perplexity,
)
from speechbrain_tpu.lm.counting import pad_ends

CORPUS = [
    "the cat sat".split(),
    "the cat ran".split(),
    "the dog sat".split(),
    "a dog ran".split(),
] * 3


def test_probabilities_normalize_within_mass_budget():
    probs, backoffs = estimate_backoff_ngram(CORPUS, order=2)
    # for every context, discounted mass + backoff mass == 1
    from collections import defaultdict

    by_context = defaultdict(float)
    for gram, logp in probs[2].items():
        by_context[gram[:-1]] += 10 ** logp
    for context, mass in by_context.items():
        reserved = 10 ** backoffs[context]
        assert abs(mass + reserved - 1.0) < 1e-9, (context, mass)


def test_trained_lm_beats_uniform_perplexity(tmp_path):
    probs, backoffs = train_ngram_arpa(
        CORPUS, tmp_path / "2g.arpa", order=2
    )
    lm = BackoffNgramLM(probs, backoffs)
    data = [list(pad_ends(s)) for s in CORPUS]
    ppl = ngram_perplexity(ngram_evaluation_details(data, lm))
    vocab = {w for s in CORPUS for w in s} | {"<s>", "</s>"}
    assert ppl < len(vocab), ppl  # far better than uniform


def test_arpa_round_trip(tmp_path):
    from speechbrain_tpu.lm.arpa import read_arpa

    path = tmp_path / "3g.arpa"
    probs, backoffs = train_ngram_arpa(CORPUS, path, order=3)
    with open(path) as f:
        counts, ngrams, bo = read_arpa(f)
    assert counts == arpa_counts(probs)
    lm_a = BackoffNgramLM(probs, backoffs)
    lm_b = BackoffNgramLM(ngrams, bo)
    for tok, ctx in [("cat", ("the",)), ("ran", ("dog",)),
                     ("sat", ("the", "cat"))]:
        assert math.isclose(
            lm_a.logprob(tok, ctx), lm_b.logprob(tok, ctx), rel_tol=1e-6
        )
