"""bench.py contract tests — specifically the round-5 fault-isolation
guarantee: one broken query records an ``err`` entry and the rest of
the inventory is still timed (BENCH_r04 was lost to a single failing
query; that must be structurally impossible now)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_inventory
from sycl_mapreduce_cpu_gpu_hybrid_spark.plans.metrics import MetricsRecorder

SF_DIR = "/root/testdata/sf0.001"


def _ok_query(spark, sf_dir):
    return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("dbl"))


def _broken_query(spark, sf_dir):
    raise RuntimeError("deliberately broken for isolation test")


def test_run_inventory_isolates_per_query_failures(spark):
    errors: dict[str, str] = {}
    timings = run_inventory(
        spark,
        SF_DIR,
        MetricsRecorder(),
        n_scale=0,
        ls=4,
        errors=errors,
        queries={"good_a": _ok_query, "bad": _broken_query, "good_b": _ok_query},
    )
    assert set(timings) == {"good_a", "good_b"}
    assert all(t >= 0 for t in timings.values())
    assert set(errors) == {"bad"}
    assert "deliberately broken" in errors["bad"]


def test_run_inventory_broken_analysis_time_query(spark):
    """A query that fails at DataFrame *construction* (analysis error,
    the BENCH_r04 failure mode) is isolated too."""

    def bad_analysis(spark, sf_dir):
        return spark.range(5).select("no_such_column")

    errors: dict[str, str] = {}
    timings = run_inventory(
        spark,
        SF_DIR,
        MetricsRecorder(),
        n_scale=0,
        ls=4,
        errors=errors,
        queries={"bad": bad_analysis, "good": _ok_query},
    )
    assert set(timings) == {"good"}
    assert set(errors) == {"bad"}
