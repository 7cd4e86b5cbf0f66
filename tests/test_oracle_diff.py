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


# --- strict parity (round-4): local gate must equal the driver's ----------
#
# Rounds 2 and 3 both shipped queries that passed the loose local
# parity but failed the driver's value hash (%.9g float folding, then
# str()-normalized Decimals). These tests pin the strict behavior so
# that class of bug cannot ship a third time.


def test_strict_norm_sees_last_bit_float_difference():
    from parity import _norm

    a = 0.1 + 0.2            # 0.30000000000000004
    b = 0.3                  # differs only past the 9th significant digit
    assert _norm(a, strict=False) == _norm(b, strict=False)  # loose mode blind
    assert _norm(a, strict=True) != _norm(b, strict=True)    # strict catches it


def test_strict_frame_signature_uses_repr():
    from parity import frame_signature

    loose_a = frame_signature(["v"], [(0.1 + 0.2,)], strict=False)
    loose_b = frame_signature(["v"], [(0.3,)], strict=False)
    assert loose_a == loose_b
    strict_a = frame_signature(["v"], [(0.1 + 0.2,)], strict=True)
    strict_b = frame_signature(["v"], [(0.3,)], strict=True)
    assert strict_a != strict_b


def test_strict_bans_decimal_outputs(spark):
    """An oracled query emitting DECIMAL must fail strict parity loudly
    (the round-3 failure mode), even when the values agree."""
    import duckdb

    from parity import compare_one

    def qfn(spark, sf_dir):
        return spark.sql("SELECT CAST(1.5 AS DECIMAL(18,4)) AS v")

    con = duckdb.connect()
    out = compare_one(
        spark, con, "dec", qfn, "SELECT CAST(1.5 AS DECIMAL(18,4)) AS v", "", strict=True
    )
    assert not out["ok"] and "DECIMAL" in out["error"]
    # loose mode (debug only) would have said the frames agree
    loose = compare_one(
        spark, con, "dec", qfn, "SELECT CAST(1.5 AS DECIMAL(18,4)) AS v", "", strict=False
    )
    assert loose["ok"]


def test_strict_watchlist_queries_pass(spark):
    """Strict parity on the repr-sensitive watchlist: the queries whose
    double outputs ride engine-rounded expressions (udf_kernel_pack RMS,
    agg averages/quantiles, the band-join average). Green here means the
    rounded doubles are bit-identical across Spark and DuckDB — the
    property the driver's hash actually checks."""
    from parity import DEFAULT_SF, compare_one, duckdb_con

    import __spark_entry__ as entrymod

    watchlist = [
        "udf_kernel_pack",
        "agg_pricing_summary",
        "agg_median",
        "join_range_band",
    ]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_con(DEFAULT_SF)
    for name in watchlist:
        out = compare_one(
            spark, con, name, qs[name], oracles[name], DEFAULT_SF, strict=True
        )
        assert out["ok"], f"{name}: {out}"
