"""Invariant tests for the round-7 additions, beyond the DuckDB
value-hash gate (tests/parity.py): re-derivations against independent
Python implementations and conservation laws the oracle can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import (
    editdistance_verify_pairs,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_editdistance_pairs_match_python_dp(spark, sf_dir):
    """Every emitted (a, b, dist) is canonical (a < b), within the
    declared threshold, and the distance equals an independent Python
    DP on the raw texts."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = editdistance_verify_pairs(docs).collect()
    assert pairs, "fixture should produce at least one verified pair"
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in pairs:
        assert r["a"] < r["b"]
        assert r["dist"] <= 60
        assert r["dist"] == _py_levenshtein(texts[r["a"]], texts[r["b"]])


def test_editdistance_block_cap_bounds_pairs(spark, sf_dir):
    """A tiny max_block must strictly shrink (or hold) the candidate
    set — the hot-bucket bound actually engages."""
    docs = load_table(spark, sf_dir, "documents")
    wide = editdistance_verify_pairs(docs, max_block=40, max_dist=10**6).count()
    tight = editdistance_verify_pairs(docs, max_block=3, max_dist=10**6).count()
    assert tight <= wide


def test_mix_schedule_conserves_budget(spark, sf_dir):
    """Largest-remainder apportionment is exact: the per-language
    sequence allocations sum to the full budget, every allocation is
    within 1 of its real-valued quota (the Hamilton property)."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        corpus_mix_schedule,
    )

    rows = corpus_mix_schedule(spark, sf_dir).collect()
    budget = 1_000_000
    total_tok = sum(r["tok"] for r in rows)
    assert sum(r["n_seq"] for r in rows) == budget
    for r in rows:
        quota = budget * r["tok"] / total_tok
        assert quota - 1 < r["n_seq"] < quota + 1


def test_quantize_int8_range_and_scale(spark, sf_dir):
    """Quantized values stay in int8 range: the per-vector digests
    bound |q_i| <= 127 via |q_sum| <= 127*dim, and maxabs is
    positive."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        embedding_quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    out = embedding_quantize_int8(spark, sf_dir)
    bad = out.where(
        (F.abs(F.col("q_sum")) > 127 * dim) | (F.col("maxabs_e6") <= 0)
    ).count()
    assert bad == 0
    assert out.count() == emb.count()


def test_concurrency_matches_bruteforce(spark, sf_dir):
    """Per-day peak concurrency equals a brute-force Python sweep over
    the same per-(user, day) session intervals."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.behavioral import (
        events_concurrency,
    )

    got = {
        r["day"]: (r["max_concurrent"], r["n_sessions"])
        for r in events_concurrency(spark, sf_dir).collect()
    }

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    sessions: dict = {}
    by_user_day: dict = {}
    for r in ev:
        by_user_day.setdefault((r["user_id"], r["ts"].date()), []).append(
            (r["ts"], r["value"])
        )
    for (user, day), rows in by_user_day.items():
        rows.sort()
        cur = None
        for ts, _v in rows:
            if cur is None or (ts - cur[1]).total_seconds() >= 1800:
                cur = [ts, ts]
                sessions.setdefault(day, []).append(cur)
            else:
                cur[1] = ts
    expect = {}
    for day, ivals in sessions.items():
        deltas = [(s, 1) for s, _ in ivals] + [(e, -1) for _, e in ivals]
        deltas.sort(key=lambda t: (t[0], -t[1]))
        run = peak = 0
        for _, d in deltas:
            run += d
            peak = max(peak, run)
        expect[day] = (peak, len(ivals))
    assert got == expect
