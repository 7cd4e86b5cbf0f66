"""Physical-plan assertions: the scale contract, checked in CI.

Each test pins the plan property that makes a query viable at
cluster scale — filter pushdown reaching the parquet scan, column
pruning, broadcast for small dimensions, map-side partial
aggregation, TakeOrderedAndProject for top-k — so a regression that
silently degrades the plan (not the result) still fails."""

from __future__ import annotations

import __spark_entry__ as entry


def _plan(spark, sf_dir, name: str) -> str:
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_project_cast")
    assert "PushedFilters: [" in plan
    # pushed-down predicate list is non-empty
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters pushed to the parquet scan"
    # column pruning: the lineitem scan must not read all 16 columns
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert read_schema.count(",") < 8, f"scan reads too many columns: {read_schema}"


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT must not global-sort"


def test_small_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_multi_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "small dims must broadcast, not shuffle"


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    assert "partial_sum" in plan or "partial_count" in plan, (
        "grouped agg must combine map-side before the shuffle"
    )


def test_kmer_single_shuffle(spark, sf_dir):
    # map phase (explode) is shuffle-free; the only Exchange is the
    # group-count, fed by map-side partial aggregation
    plan = _plan(spark, sf_dir, "kmer_count_k4")
    assert plan.count("Exchange") <= 1, plan
    assert "partial_count" in plan


def test_exact_dedup_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_exact")
    assert plan.count("Exchange") <= 1, plan


def test_fingerprint_no_shuffle_before_agg(spark, sf_dir):
    # winnowing runs inside per-row array expressions: no window sort,
    # no distinct exchange; the only Exchange is the final summary agg
    plan = _plan(spark, sf_dir, "text_fingerprint")
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # optional spread repartition + agg
