"""Bucketing and partition pruning — plan-level proof that the
storage layout removes shuffle/scan work."""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.warehouse import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", n_buckets=4)
    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")

    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    # result is still correct vs the plain join
    plain = orders.join(lineitem, "o_orderkey")
    assert joined.count() == plain.count()


def test_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(events, out, ["day"])

    days = [r["day"] for r in events.select("day").distinct().collect()]
    one_day = sorted(days)[0]
    scan = spark.read.parquet(out).where(F.col("day") == F.lit(one_day))
    plan = _plan(scan)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf, plan
    # pruned scan reads exactly that day's rows
    assert scan.count() == events.where(F.col("day") == F.lit(one_day)).count()


def test_declared_bucketed_join_no_join_exchange(spark, sf_dir):
    """The declared query's join must run exchange-free: the only
    Exchange in the executed plan is the final aggregation shuffle."""
    import __spark_entry__ as entry

    df = entry.queries()["join_bucketed_colocated"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints final + initial plans; judge the final only
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final
    assert final.count("Exchange") <= 1, final


def test_declared_dpp_query_prunes_at_runtime(spark, sf_dir):
    """The declared DPP query must carry a dynamicpruning expression in
    its fact-scan partition filters — proof the quarter filter on the
    dim side prunes fact partitions at runtime rather than scanning
    all 80 months."""
    import __spark_entry__ as entry

    df = entry.queries()["join_partition_pruned"](spark, sf_dir)
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_zorder_layout_colocates_both_dimensions(spark, sf_dir, tmp_path):
    """Sorting files by the Morton key must bound per-file min/max
    spread on BOTH dimensions, while a single-column sort leaves the
    other dimension's per-file spread at ~full range — the property
    that makes row-group stats prunable on either predicate."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.warehouse import (
        zorder_key_exprs,
    )

    spark_expr, _ = zorder_key_exprs("user_id", "day_ord")
    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_ord"),
        )
        .withColumn("zkey", F.expr(spark_expr).cast("bigint"))
    )
    n_files = 16

    def spreads(df, sort_col):
        path = str(tmp_path / f"by_{sort_col}")
        df.repartitionByRange(n_files, F.col(sort_col)).write.mode(
            "overwrite"
        ).parquet(path)
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("u_spread"),
                (F.max("day_ord") - F.min("day_ord")).alias("d_spread"),
            )
            .collect()
        )
        n = len(per_file)
        return (
            sum(r.u_spread for r in per_file) / n,
            sum(r.d_spread for r in per_file) / n,
        )

    u_z, d_z = spreads(e, "zkey")
    u_u, d_u = spreads(e, "user_id")
    full_day = 29
    # user-sorted files: perfect on user, useless on day
    assert d_u >= full_day * 0.9
    # z-ordered files: materially bounded on BOTH dimensions
    assert d_z <= full_day * 0.6
    assert u_z <= u_u + 150 * 0.6  # user spread stays bounded too
