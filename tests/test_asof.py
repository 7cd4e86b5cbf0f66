"""Unit tests for the as-of join operator (all four direction x
exactness variants) on a hand-computable fixture."""

from __future__ import annotations

from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.asof import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("b", 5, "L3"), ("c", 7, "L4")],
        "k string, t int, lv string",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 6, 3.0)],
        "k string, t int, rv double",
    )
    return left, right


def _result(df):
    return {r["lv"]: r["rv_asof"] for r in df.collect()}


def test_backward_exact(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "t", ["rv"])
    # L1 at t=10 matches the equal-ts right (exact allowed); L3 at t=5
    # has no right <= 5; key c has no rights at all
    assert _result(out) == {"L1": 1.0, "L2": 2.0, "L3": None, "L4": None}


def test_backward_strict(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "t", ["rv"], allow_exact_matches=False)
    assert _result(out) == {"L1": None, "L2": 2.0, "L3": None, "L4": None}


def test_forward_exact(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "t", ["rv"], direction="forward")
    assert _result(out) == {"L1": 1.0, "L2": None, "L3": 3.0, "L4": None}


def test_forward_strict(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, ["k"], "t", "t", ["rv"], direction="forward", allow_exact_matches=False
    )
    assert _result(out) == {"L1": 2.0, "L2": None, "L3": 3.0, "L4": None}


def test_left_rows_preserved_and_single_shuffle(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "t", ["rv"])
    assert out.count() == left.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the window partitioning, none for a join
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
