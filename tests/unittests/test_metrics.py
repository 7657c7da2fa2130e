"""Tests for edit distance and metric accumulation."""

import io

import numpy as np

from speechbrain_tpu.utils.edit_distance import (
    accumulatable_wer_stats,
    alignment,
    op_table,
    wer_details_for_batch,
    wer_summary,
)
from speechbrain_tpu.utils.metric_stats import (
    EER,
    BinaryMetricStats,
    ClassificationStats,
    ErrorRateStats,
    MetricStats,
    minDCF,
)


def test_accumulatable_wer():
    refs = [["a", "b", "c"], ["d", "e"]]
    hyps = [["a", "b", "d"], ["d", "e", "f"]]
    stats = accumulatable_wer_stats(refs, hyps)
    assert stats["num_ref_tokens"] == 5
    assert stats["substitutions"] == 1
    assert stats["insertions"] == 1
    assert stats["deletions"] == 0
    assert abs(stats["WER"] - 40.0) < 1e-9
    # accumulate more
    stats = accumulatable_wer_stats([["x"]], [["x"]], stats)
    assert stats["num_ref_tokens"] == 6


def test_alignment():
    table = op_table([1, 2, 3], [1, 3])
    ali = alignment(table)
    ops = [a[0] for a in ali]
    assert ops.count("D") == 1
    assert ops.count("=") == 2


def test_wer_details_and_summary():
    details = wer_details_for_batch(
        ["u1", "u2"], [[1, 2], [3]], [[1, 2], [4]], compute_alignments=True
    )
    summary = wer_summary(details)
    assert summary["num_scored_tokens"] == 3
    assert summary["num_edits"] == 1
    assert abs(summary["WER"] - 100.0 / 3) < 1e-9
    assert summary["SER"] == 50.0


def test_error_rate_stats_with_lengths():
    stats = ErrorRateStats()
    predict = np.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    target = np.array([[1, 2, 4, 0], [4, 5, 0, 0]])
    stats.append(
        ["u1", "u2"],
        predict, target,
        predict_len=np.array([0.75, 0.5]),
        target_len=np.array([0.75, 0.5]),
    )
    wer = stats.summarize("WER")
    assert abs(wer - 20.0) < 1e-9  # 1 sub / 5 ref tokens
    out = io.StringIO()
    stats.write_stats(out)
    assert "%WER 20.00" in out.getvalue()


def test_eer_perfect_separation():
    eer, th = EER(np.array([0.8, 0.9]), np.array([0.1, 0.2]))
    assert eer == 0.0
    assert 0.2 < th < 0.8


def test_eer_overlap():
    pos = np.array([0.3, 0.6, 0.7, 0.9])
    neg = np.array([0.1, 0.2, 0.65, 0.4])
    eer, th = EER(pos, neg)
    assert 0.0 < eer <= 0.5


def test_min_dcf():
    dcf, th = minDCF(np.array([0.8, 0.9]), np.array([0.1, 0.2]))
    assert dcf == 0.0


def test_binary_metric_stats():
    stats = BinaryMetricStats()
    stats.append(["a", "b", "c", "d"], [0.9, 0.8, 0.3, 0.1], [1, 1, 0, 0])
    summary = stats.summarize()
    assert summary["F-score"] > 0.99
    assert summary["TP"] == 2


def test_classification_stats():
    stats = ClassificationStats()
    stats.append(["u1", "u2", "u3"], ["cat", "dog", "cat"], ["cat", "dog", "dog"])
    s = stats.summarize()
    assert abs(s["accuracy"] - 2 / 3) < 1e-9
    out = io.StringIO()
    stats.write_stats(out)
    assert "Overall accuracy" in out.getvalue()


def test_metric_stats_minmax():
    stats = MetricStats(metric=lambda x: x)
    stats.append(["a", "b", "c"], np.array([3.0, 1.0, 2.0]))
    s = stats.summarize()
    assert s["min_id"] == "b" and s["max_id"] == "a"
