"""Negative-path tests for the oracle-diff harness: a checker that
cannot fail is not a checker. Each case plants one defect class and
asserts diff_keyed reports it — including the NULL traps (legit NULL
value vs missing row; NULL != NULL comparisons) that silently passed
in a naive formulation."""

from __future__ import annotations

import pytest

from sycl_mapreduce_cpu_gpu_hybrid_spark.oracle import assert_matches, diff_keyed


def _df(spark, rows):
    return spark.createDataFrame(rows, "word string, cnt long")


def test_value_mismatch_detected(spark):
    a = _df(spark, [("x", 1), ("y", 2)])
    b = _df(spark, [("x", 1), ("y", 3)])
    d = diff_keyed(a, b, ["word"], ["cnt"]).collect()
    assert len(d) == 1 and d[0]["status"] == "mismatch"


def test_missing_row_each_side_detected(spark):
    a = _df(spark, [("x", 1), ("only_a", 9)])
    b = _df(spark, [("x", 1), ("only_b", 7)])
    statuses = {r["word"]: r["status"] for r in diff_keyed(a, b, ["word"], ["cnt"]).collect()}
    assert statuses == {"only_a": "missing_in_engine", "only_b": "missing_in_oracle"}


def test_null_value_is_not_a_missing_row(spark):
    # a row whose VALUE is legitimately NULL on both sides must pass
    a = _df(spark, [("x", None), ("y", 2)])
    b = _df(spark, [("x", None), ("y", 2)])
    assert diff_keyed(a, b, ["word"], ["cnt"]).count() == 0


def test_null_vs_value_is_a_mismatch(spark):
    # NULL on one side only must surface, not vanish through `!=`
    a = _df(spark, [("x", None)])
    b = _df(spark, [("x", 5)])
    d = diff_keyed(a, b, ["word"], ["cnt"]).collect()
    assert len(d) == 1 and d[0]["status"] == "mismatch"


def test_assert_matches_raises_on_defect(spark):
    a = _df(spark, [("x", 1)])
    b = _df(spark, [("x", 2)])
    with pytest.raises(AssertionError):
        assert_matches(a, b, ["word"], ["cnt"])
