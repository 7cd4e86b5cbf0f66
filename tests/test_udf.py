"""Kernel-registration surface tests (SURVEY §2.9): scalar and
grouped-agg pandas_udf kernels callable from SQL."""

from __future__ import annotations

import pandas as pd
import pytest

from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.udf import (
    register_grouped_agg_kernel,
    register_scalar_kernel,
    vowel_ratio_series,
)


def test_scalar_kernel_from_sql(spark):
    register_scalar_kernel(spark, "t_vratio", vowel_ratio_series, "double")
    out = spark.sql("SELECT round(t_vratio('hello'), 2) AS r").collect()
    assert out[0]["r"] == pytest.approx(0.4)  # 2 vowels / 5 chars


def test_grouped_agg_kernel(spark):
    def weighted_sum(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum())

    register_grouped_agg_kernel(spark, "t_wsum", weighted_sum, "double")
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 3.0, 4.0), ("b", 5.0, 6.0)], "k string, v double, w double"
    )
    df.createOrReplaceTempView("t_udf_in")
    rows = spark.sql("SELECT k, t_wsum(v, w) AS s FROM t_udf_in GROUP BY k").collect()
    assert {r["k"]: r["s"] for r in rows} == {"a": 14.0, "b": 30.0}
