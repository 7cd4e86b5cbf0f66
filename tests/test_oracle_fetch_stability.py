"""Oracle fetch-path stability gate (r6 verdict #1).

The driver's correctness gate fetches DuckDB oracle results through a
pandas/arrow path, while this repo's strict parity uses ``fetchall``.
The two disagree on exactly one class of values: DuckDB's widened
integer aggregates. ``SUM(BIGINT)`` returns HUGEINT, which ``fetchall``
renders as a plain Python int (identical to Spark's BIGINT) but
``.df()`` degrades to float64 and ``.arrow()`` to decimal128(38,0) —
both of which hash differently from an int. That asymmetry was the
entire cause of the only two red rows in CORRECTNESS_r06.json
(multimodal_decode_resize / multimodal_audio_stats, the only oracles
with uncast sums; reproduced directly in this environment).

These tests pin the mechanism so the class cannot recur:

1. every declared oracle must emit only fetch-path-stable result
   types (no HUGEINT, no DECIMAL) — pure DuckDB, no Spark session;
2. the DuckDB constructs the multimodal oracles now rely on
   (``string_agg(expr, sep ORDER BY ...)``, ``md5``, ``//``,
   ``CAST(... AS BIGINT)`` de-widening) behave as authored;
3. the de-widening cast actually restores int-typed pandas/arrow
   fetches, i.e. the fix closes the driver-vs-local gap rather than
   moving it.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import duckdb_con  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

UNSTABLE = ("HUGEINT", "DECIMAL")


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_no_oracle_emits_fetch_unstable_types():
    """Every oracle's DuckDB result schema is free of HUGEINT/DECIMAL.

    Checked at the TYPE level (relation.types), not the value level:
    fetchall hides the widening, which is exactly how the r6 failures
    slipped past local parity."""
    con = duckdb_con(SF_DIR)
    offenders = {}
    for name, sql in _oracles().items():
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(u in str(t) for u in UNSTABLE)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting fetch-path-unstable result types "
        f"(CAST the aggregate): {offenders}"
    )


def test_sum_bigint_widens_and_cast_dewidens():
    """Pin the mechanism: native SUM(BIGINT) is HUGEINT (float64 via
    .df()), while CAST(...AS BIGINT) restores an int64 pandas fetch."""
    con = duckdb.connect()
    base = "FROM (SELECT CAST(5 AS BIGINT) x UNION ALL SELECT 7)"
    widened = con.sql(f"SELECT SUM(x) s {base}")
    assert str(widened.types[0]) == "HUGEINT"
    assert str(widened.df()["s"].dtype) == "float64"
    dewidened = con.sql(f"SELECT CAST(SUM(x) AS BIGINT) s {base}")
    assert str(dewidened.types[0]) == "BIGINT"
    assert str(dewidened.df()["s"].dtype) == "int64"
    assert dewidened.fetchall() == [(12,)]


def test_string_agg_order_by_and_md5_pinned():
    """The rewritten multimodal oracles hang their hash on
    string_agg's in-aggregate ORDER BY and on md5's lowercase-hex
    rendering; probe both against hand-computed values."""
    import hashlib

    con = duckdb.connect()
    got = con.sql(
        "SELECT string_agg(CAST(v AS VARCHAR), ',' ORDER BY k) s"
        " FROM (VALUES (3, 30), (1, 10), (2, 20)) t(k, v)"
    ).fetchall()
    assert got == [("10,20,30",)]
    (digest,) = con.sql("SELECT md5('10,20,30')").fetchone()
    assert digest == hashlib.md5(b"10,20,30").hexdigest()


def test_integer_division_truncation_pinned():
    """DuckDB ``//`` matches Spark ``DIV``: both truncate toward ZERO
    (unlike Python's floor division), so (-7)//2 is -3 on both
    engines — the property the registry docstring documents as
    verified and every fixed-point oracle relies on."""
    con = duckdb.connect()
    rows = con.sql(
        "SELECT 7 // 2 a, (-7) // 2 b, CAST(70001 AS BIGINT) // 7 c"
    ).fetchone()
    assert rows == (3, -3, 10000)


@pytest.mark.parametrize("name", ["multimodal_decode_resize", "multimodal_audio_stats"])
def test_multimodal_oracles_pandas_fetch_int_typed(name):
    """End-to-end on the real fixture: the two previously-red oracles
    now come back int-typed through the pandas path the driver uses."""
    con = duckdb_con(SF_DIR)
    pdf = con.sql(_oracles()[name]).df()
    int_cols = [c for c in pdf.columns if c.endswith(("sum", "amp", "samples"))]
    assert int_cols, f"expected integer stat columns in {name}"
    for c in int_cols:
        assert str(pdf[c].dtype).startswith("int"), (name, c, pdf[c].dtype)
