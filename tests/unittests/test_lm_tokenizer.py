"""Tests for n-gram LM and the BPE tokenizer."""

import io
import json
import os

import numpy as np

from speechbrain_tpu.lm.arpa import arpa_to_dense, read_arpa
from speechbrain_tpu.lm.counting import ngrams, ngrams_for_evaluation, pad_ends
from speechbrain_tpu.lm.ngram import BackoffNgramLM, ngram_evaluation_details, ngram_perplexity
from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

ARPA = """
\\data\\
ngram 1=3
ngram 2=2

\\1-grams:
-0.5\ta\t-0.3
-0.7\tb
-1.0\t<s>

\\2-grams:
-0.2\ta b
-0.4\t<s> a

\\end\\
"""


def test_read_arpa():
    num, grams, backoffs = read_arpa(io.StringIO(ARPA))
    assert num == {1: 3, 2: 2}
    assert grams[1][("a",)] == -0.5
    assert grams[2][("a", "b")] == -0.2
    assert backoffs[("a",)] == -0.3


def test_backoff_lm():
    num, grams, backoffs = read_arpa(io.StringIO(ARPA))
    lm = BackoffNgramLM(grams, backoffs)
    assert lm.logprob("b", ("a",)) == -0.2
    # backoff: no ("b","a") bigram -> backoff(b)=0 + unigram(a)
    assert lm.logprob("a", ("b",)) == -0.5


def test_perplexity():
    num, grams, backoffs = read_arpa(io.StringIO(ARPA))
    lm = BackoffNgramLM(grams, backoffs)
    details = ngram_evaluation_details([["a", "b"]], lm)
    ppl = ngram_perplexity(details)
    assert ppl > 1.0


def test_arpa_to_dense():
    tok2id = {"a": 0, "b": 1, "<s>": 2}
    uni, bi = arpa_to_dense(io.StringIO(ARPA), tok2id, 3)
    assert uni[0] == -0.5
    assert bi[0, 1] == -0.2  # a -> b explicit
    assert abs(bi[1, 0] - (-0.5)) < 1e-6  # b -> a backoff


def test_counting():
    assert list(pad_ends(["x"])) == ["<s>", "x", "</s>"]
    assert list(ngrams([1, 2, 3], 2)) == [(1, 2), (2, 3)]
    assert list(ngrams_for_evaluation(["a", "b", "c"], 2)) == [
        ("b", ("a",)), ("c", ("b",))
    ]


def test_bpe_tokenizer_roundtrip(tmp_path):
    ann = tmp_path / "train.json"
    texts = {
        f"u{i}": {"words": w}
        for i, w in enumerate(
            ["hello world", "hello there world", "the quick brown fox",
             "the lazy dog", "hello quick dog"] * 3
        )
    }
    ann.write_text(json.dumps(texts))
    sp = SentencePiece(
        str(tmp_path / "tok"), vocab_size=60, annotation_train=str(ann),
        annotation_read="words", model_type="bpe",
    )
    ids = sp.sp.encode_as_ids("hello lazy fox")
    assert sp.sp.decode_ids(ids) == "hello lazy fox"
    # merges learned: frequent word "hello" should be few pieces
    assert len(sp.sp.encode_as_pieces("hello")) <= 3
    # reload from disk
    sp2 = SentencePiece(str(tmp_path / "tok"), vocab_size=60, model_type="bpe")
    assert sp2.sp.encode_as_ids("hello lazy fox") == ids


def test_bpe_batch_api(tmp_path):
    ann = tmp_path / "t.json"
    ann.write_text(json.dumps({"u1": {"words": "ab ab cd"}}))
    sp = SentencePiece(str(tmp_path / "tok2"), vocab_size=20,
                       annotation_train=str(ann), annotation_read="words",
                       model_type="bpe")
    arr, lens = sp(["ab cd", "ab"], batch_lens=True)
    assert arr.shape[0] == 2
    decoded = sp(arr, lens, task="decode")
    assert decoded[0] == ["ab", "cd"]


def test_char_tokenizer(tmp_path):
    ann = tmp_path / "t.json"
    ann.write_text(json.dumps({"u1": {"words": "abc"}}))
    sp = SentencePiece(str(tmp_path / "tok3"), vocab_size=30,
                       annotation_train=str(ann), annotation_read="words",
                       model_type="char")
    pieces = sp.sp.encode_as_pieces("abc")
    assert all(len(p.replace("▁", "")) <= 1 for p in pieces)


def test_sentencepiece_unigram_mode(tmp_path):
    """Unigram training (reference SentencePiece.py:24 trains
    bpe/unigram/char): Viterbi segmentation roundtrips and learns
    multi-char pieces."""
    import json

    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    ann = tmp_path / "train.json"
    texts = {f"u{i}": {"words": w} for i, w in enumerate(
        ["hello world", "hello there world", "the quick brown fox",
         "the lazy dog", "hello quick world there", "worldly things"] * 3
    )}
    ann.write_text(json.dumps(texts))
    sp = SentencePiece(str(tmp_path), vocab_size=40,
                       annotation_train=str(ann),
                       annotation_read="words", model_type="unigram")
    ids = sp.sp.encode_as_ids("hello world")
    assert sp.sp.decode_ids(ids) == "hello world"
    assert any(len(p) > 2 for p in sp.sp.pieces)  # learned real pieces
    # persisted model reloads as unigram
    sp2 = SentencePiece(str(tmp_path), vocab_size=40, model_type="unigram")
    assert sp2.sp.decode_ids(sp2.sp.encode_as_ids("the lazy dog")) == (
        "the lazy dog"
    )


def test_read_kaldi_lab(tmp_path):
    """Native Kaldi alignment reader (reference dataio/dataio.py:851)."""
    import gzip

    import numpy as np

    from speechbrain_tpu.dataio.dataio import read_kaldi_lab

    with gzip.open(tmp_path / "ali.1.gz", "wt") as f:
        f.write("utt1 1 2 3 4\nutt2 5 6\n")
    lab = read_kaldi_lab(str(tmp_path))
    assert set(lab) == {"utt1", "utt2"}
    np.testing.assert_array_equal(lab["utt1"], [1, 2, 3, 4])
