"""Invariant tests for the grouping-sets / Pareto / histogram / TF-IDF
additions (hash parity vs DuckDB is covered by tests/parity.py)."""

from __future__ import annotations

from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import text_tfidf_topterms
from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.relational import (
    agg_grouping_sets,
    events_histogram,
    pareto_revenue,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table


def test_grouping_sets_levels(spark, sf_dir):
    rows = agg_grouping_sets(spark, sf_dir).collect()
    gids = {r["gid"] for r in rows}
    # detail cells (0), returnflag subtotal (1), grand total (3);
    # no linestatus-only level (2) — the set rollup/cube can't express
    assert gids == {0, 1, 3}
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    detail_n = sum(r["n"] for r in rows if r["gid"] == 0)
    assert total[0]["n"] == detail_n


def test_pareto_monotone_and_complete(spark, sf_dir):
    rows = sorted(
        pareto_revenue(spark, sf_dir).collect(),
        key=lambda r: (-r["cents"], r["p_key"]),
    )
    shares = [r["cum_share_e4"] for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 10000
    classes = [r["abc_class"] for r in rows]
    # classes are contiguous A..B..C in rank order
    assert "".join(dict.fromkeys(classes)) in ("ABC", "AB", "AC", "A")


def test_histogram_preserves_total(spark, sf_dir):
    rows = events_histogram(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    assert all(r["bucket"] >= 0 for r in rows)


def test_tfidf_topk_shape(spark, sf_dir):
    rows = text_tfidf_topterms(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in per_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # scores non-increasing in rank order
        by_rank = sorted(rs, key=lambda r: r["rank"])
        assert all(
            a["score"] >= b["score"] for a, b in zip(by_rank, by_rank[1:])
        )

def test_tfidf_single_run_and_edge_docs(spark, sf_dir):
    """Run-start extraction over degenerate documents (r12 advisory):
    a single-run document (every bigram identical) must yield exactly
    one tf row with tf == run length, regardless of whether the
    engine short-circuits the i==1 disjunct — the lookback index is
    clamped so element_at(sb, 0) is never constructed. Also pins the
    0-bigram (one-token) and 1-bigram shapes."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # 4 identical bigrams, 1 run
            (2, "solo"),  # no bigrams -> no tf rows
            (3, "alpha beta"),  # exactly one bigram
        ],
        "doc_id int, text string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        rows = text_tfidf_topterms(spark, td).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 1
    assert by_doc[1][0]["term"] == "spam spam"
    assert by_doc[1][0]["tf"] == 4
    assert 2 not in by_doc
    assert len(by_doc.get(3, [])) == 1
    assert by_doc[3][0]["tf"] == 1
