"""Salted aggregation / join: results must equal the unsalted plans,
and the salt must actually spread a hot key over many sub-groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.skew import (
    salted_group_sum,
    salted_join,
    top_heavy_keys,
)


def _skewed(spark, n=10_000):
    # 80% of rows share key 0; the rest spread over 100 keys. Values
    # are distinct per row — content-hash salting needs row diversity
    # (see salted_group_sum docstring for the duplicate-row caveat)
    return spark.range(n).select(
        F.when(F.col("id") % 5 < 4, 0)
        .otherwise(F.pmod(F.col("id"), 100))
        .alias("k"),
        F.col("id").cast("double").alias("v"),
    )


def test_salted_group_sum_matches_plain(spark):
    df = _skewed(spark).withColumn("w", F.col("v") * 2)
    got = {
        r["k"]: (r["sum_v"], r["count_w"], r["max_v"])
        for r in salted_group_sum(
            df, ["k"], {"v": "sum", "w": "count"}, n_salts=8
        )
        .join(salted_group_sum(df, ["k"], {"v": "max"}, n_salts=8), "k")
        .collect()
    }
    want = {
        r["k"]: (r["s"], r["c"], r["m"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("w").alias("c"), F.max("v").alias("m"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    large = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    got = salted_join(large, small, "k", n_salts=8)
    plain = large.join(small, "k")
    assert got.count() == plain.count()
    assert (
        got.agg(F.sum("dim")).collect()[0][0]
        == plain.agg(F.sum("dim")).collect()[0][0]
    )


def test_salt_spreads_hot_key(spark):
    df = _skewed(spark)
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.skew import _SALT

    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    )
    per_salt = (
        salted.where(F.col("k") == 0).groupBy(_SALT).count().collect()
    )
    assert len(per_salt) == 8  # the hot key occupies every salt bucket
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)  # roughly even spread


def test_top_heavy_keys_finds_the_hot_key(spark):
    df = _skewed(spark)
    hot = top_heavy_keys(df, "k", min_frac=0.5).collect()
    assert len(hot) == 1 and hot[0]["k"] == 0
