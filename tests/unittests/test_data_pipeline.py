"""Tests for depgraph + data pipeline (mirrors reference test strategy)."""

import pytest

from speechbrain_tpu.utils.depgraph import CircularDependencyError, DependencyGraph
from speechbrain_tpu.utils.data_pipeline import DataPipeline, provides, takes


def test_toposort_simple():
    g = DependencyGraph()
    g.add_node("a")
    g.add_node("b")
    g.add_node("c")
    g.add_edge("b", "a")
    g.add_edge("c", "b")
    order = [n.key for n in g.get_evaluation_order()]
    assert order.index("a") < order.index("b") < order.index("c")


def test_cycle_detection():
    g = DependencyGraph()
    g.add_edge("a", "b")
    g.add_edge("b", "a")
    with pytest.raises(CircularDependencyError):
        list(g.get_evaluation_order())
    assert not g.is_valid()


def test_selected_keys():
    g = DependencyGraph()
    g.add_node("a")
    g.add_node("b")
    g.add_node("c")
    g.add_edge("b", "a")
    order = [n.key for n in g.get_evaluation_order(selected_keys=["b"])]
    assert order == ["a", "b"]
    assert "c" not in order


def test_pipeline_basic():
    pipeline = DataPipeline(
        static_data_keys=["text"],
        dynamic_items=[
            {"func": str.lower, "takes": "text", "provides": "lower"},
            {"func": lambda s: s + "!", "takes": "lower", "provides": "excl"},
        ],
        output_keys=["excl"],
    )
    assert pipeline({"text": "HELLO"}) == {"excl": "hello!"}


def test_pipeline_only_computes_needed():
    calls = []

    def expensive(x):
        calls.append(x)
        return x

    pipeline = DataPipeline(
        static_data_keys=["a"],
        dynamic_items=[
            {"func": expensive, "takes": "a", "provides": "b"},
            {"func": lambda x: x * 2, "takes": "a", "provides": "c"},
        ],
        output_keys=["c"],
    )
    out = pipeline({"a": 3})
    assert out == {"c": 6}
    assert calls == []  # "b" never computed


def test_pipeline_generator_item():
    @takes("text")
    @provides("words", "nwords")
    def split(text):
        words = text.split()
        yield words
        yield len(words)

    pipeline = DataPipeline(["text"], [split], output_keys=["words", "nwords"])
    out = pipeline({"text": "a b c"})
    assert out == {"words": ["a", "b", "c"], "nwords": 3}


def test_pipeline_generator_partial_stage():
    """Only the first stage is computed when only its key is requested."""

    @takes("x")
    @provides("first", "second")
    def gen(x):
        yield x + 1
        yield x + 2

    pipeline = DataPipeline(["x"], [gen], output_keys=["first"])
    assert pipeline({"x": 1}) == {"first": 2}


def test_pipeline_output_mapping():
    pipeline = DataPipeline(
        ["x"],
        [{"func": lambda v: v * 10, "takes": "x", "provides": "y"}],
        output_keys={"renamed": "y"},
    )
    assert pipeline({"x": 2}) == {"renamed": 20}


def test_pipeline_missing_key_raises():
    pipeline = DataPipeline(
        ["x"],
        [{"func": lambda v: v, "takes": "nonexistent", "provides": "y"}],
        output_keys=["y"],
    )
    with pytest.raises(RuntimeError):
        pipeline({"x": 1})
