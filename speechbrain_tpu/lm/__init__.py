"""n-gram language modeling: ARPA IO, backoff LM, counting."""

from speechbrain_tpu.lm.ngram import BackoffNgramLM  # noqa: F401
