"""Drift guards for generated oracles (functions/oracle_gen.py).

These tests don't run Spark or DuckDB; they assert the *coupling* —
that every shared constant actually lands in the generated SQL, so an
edit to the constant cannot leave a stale hand-written literal behind.
(End-to-end value agreement is tests/parity.py's job.)
"""

from __future__ import annotations

import duckdb
import pytest

from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.oracle_gen import (
    sql_float_list,
    sql_list,
    sql_literal,
    sql_values,
    sql_values_from_mapping,
)


def test_sql_literal_escaping():
    assert sql_literal("o'brien") == "'o''brien'"
    assert sql_literal(3) == "3"
    assert sql_literal(0.5) == "0.5"
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"


def test_renderers_produce_valid_duckdb():
    con = duckdb.connect()
    assert con.sql(f"SELECT {sql_list(['a', 'b'])}").fetchone()[0] == ["a", "b"]
    assert con.sql(f"SELECT {sql_float_list([1, -1])}").fetchone()[0] == [1.0, -1.0]
    rows = con.sql(
        "SELECT * FROM "
        + sql_values([("en", ["the", "of"]), ("de", ["der"])], "t", ["lang", "words"])
        + " ORDER BY lang"
    ).fetchall()
    assert rows == [("de", ["der"]), ("en", ["the", "of"])]


def test_langid_oracle_contains_every_stopword():
    from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.text import STOPWORDS
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import _langid_oracle_sql

    sql = _langid_oracle_sql()
    for lang, words in STOPWORDS.items():
        assert f"'{lang}'" in sql
        for w in words:
            assert f"'{w}'" in sql


def test_langid_oracle_tracks_constant_edits(monkeypatch):
    import sycl_mapreduce_cpu_gpu_hybrid_spark.functions.text as text_mod
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import _langid_oracle_sql

    edited = dict(text_mod.STOPWORDS)
    edited["xx"] = ["zzyzx"]
    monkeypatch.setattr(text_mod, "STOPWORDS", edited)
    sql = _langid_oracle_sql()
    assert "'xx'" in sql and "'zzyzx'" in sql


def test_embedding_oracle_renders_the_shared_planes():
    from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.porthash import rademacher_matrix
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        _EMB_LSH,
        _embedding_lsh_oracle_sql,
    )

    planes = rademacher_matrix(_EMB_LSH["n_planes"], _EMB_LSH["dim"])
    sql = _embedding_lsh_oracle_sql(
        n_planes=_EMB_LSH["n_planes"],
        bands=_EMB_LSH["bands"],
        threshold=_EMB_LSH["threshold"],
        max_bucket=_EMB_LSH["max_bucket"],
        dim=_EMB_LSH["dim"],
    )
    assert sql_float_list(planes[0]) in sql
    assert sql_float_list(planes[-1]) in sql


def test_portable_hash_agrees_between_renderer_and_duckdb(spark):
    # the shared-hash contract end-to-end at the cheapest possible
    # scale: one literal, THREE independent evaluations — hashlib (the
    # spec: first 15 hex chars of md5, seed salted with \x1f), DuckDB
    # via the rendered SQL, and Spark via the Column expression — must
    # produce the same integer, not merely in-range values
    import hashlib

    from pyspark.sql import functions as F

    from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.oracle_gen import (
        portable_hash64_sql,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.porthash import (
        SEP,
        portable_hash64,
    )

    expected = int(hashlib.md5(f"ACGTAC{SEP}3".encode()).hexdigest()[:15], 16)
    assert 0 <= expected < (1 << 60)

    con = duckdb.connect()
    duck_v = con.sql("SELECT " + portable_hash64_sql("'ACGTAC'", seed=3)).fetchone()[0]
    assert duck_v == expected

    spark_v = spark.range(1).select(
        portable_hash64(F.lit("ACGTAC"), seed=3).alias("h")
    ).first()["h"]
    assert spark_v == expected


def test_gate_priority_names_all_exist():
    """_GATE_PRIORITY entries are filtered with `if k in out`, so a
    typo silently demotes a weak-evidence query to the back of the
    sample order — exactly the queries that most need driver coverage.
    Pin every name to a declared query."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark import queries as q

    declared = set()
    for mod in q._MODULES:
        declared |= set(mod.QUERIES)
    missing = [n for n in q._GATE_PRIORITY if n not in declared]
    assert not missing, f"_GATE_PRIORITY names not declared: {missing}"
    # and priority really leads the iteration order
    ordered = list(q.all_queries())
    assert ordered[: len(q._GATE_PRIORITY)] == [
        n for n in q._GATE_PRIORITY if n in declared
    ]
