"""Plan pins + properties for the classic-warehouse suite
(queries/tpch.py) and the chunk/pack/balance trio (queries/llm.py):
the DuckDB value parity lives in tests/parity.py; these assert the
PLAN shapes (decorrelation, top-k) and the algebraic invariants the
hash can't see."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
    _CHUNK_S,
    _CHUNK_W,
    corpus_pack_tokens,
    corpus_temperature_weights,
    text_chunk_sliding,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.tpch import (
    events_rolling_distinct,
    join_exists_correlated,
    orders_yoy_growth,
    tpch_q3_priority,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_correlated_decorrelates_to_semi_anti(spark, sf_dir):
    """EXISTS / NOT EXISTS must become hash semi/anti joins — never a
    per-row subquery: that's the plan that scales."""
    plan = _plan(join_exists_correlated(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q3_topk_never_global_sorts(spark, sf_dir):
    plan = _plan(tpch_q3_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_yoy_growth_null_exactly_on_first_year(spark, sf_dir):
    rows = orders_yoy_growth(spark, sf_dir).collect()
    first_year = {}
    for r in rows:
        first_year[r.n_name] = min(first_year.get(r.n_name, r.yr), r.yr)
    for r in rows:
        assert (r.growth_e4 is None) == (r.yr == first_year[r.n_name]), r


def test_rolling_distinct_matches_bruteforce(spark, sf_dir):
    """The distributed earliest-day-attribution rewrite must equal the
    naive per-day set-union over the trailing 7 days."""
    e = load_table(spark, sf_dir, "events")
    pairs = {
        (r.d, r.user_id)
        for r in e.select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
            "user_id",
        ).distinct().collect()
    }
    days = sorted({d for d, _ in pairs})
    expect = {
        g: len({u for d, u in pairs if g - 6 <= d <= g}) for g in days
    }
    got = {
        r.day_ord: r.u7 for r in events_rolling_distinct(spark, sf_dir).collect()
    }
    assert got == expect


def test_chunk_sliding_reconstructs_documents(spark, sf_dir):
    """Chunk count, coverage, and md5 identity vs a direct Python
    re-derivation for every doc in the smoke fixture."""
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {}
    for r in text_chunk_sliding(spark, sf_dir).collect():
        got.setdefault(r.doc_id, {})[r.chunk_ix] = (r.chunk_chars, r.chunk_md5)
    for doc_id, text in docs.items():
        n = max(len(text), 1)
        n_chunks = 1 + (n - 1) // _CHUNK_S
        chunks = got[doc_id]
        assert len(chunks) == n_chunks
        for i in range(n_chunks):
            piece = text[i * _CHUNK_S : i * _CHUNK_S + _CHUNK_W]
            md5 = hashlib.md5(piece.encode()).hexdigest()
            assert chunks[i] == (len(piece), md5), (doc_id, i)
        # stride < width -> every char is covered by some chunk
        assert (n_chunks - 1) * _CHUNK_S + _CHUNK_W >= len(text)


def test_pack_tokens_conserves_docs_and_tokens(spark, sf_dir):
    """Packing must move every doc and every token into exactly one
    sequence bin, and bin 0 must exist per language (first doc's first
    token lands at offset 0)."""
    d = load_table(spark, sf_dir, "documents")
    totals = {
        r.lang: (r.nd, r.tk)
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum(
                F.when(F.length(F.trim("text")) == 0, 0).otherwise(
                    F.size(F.split(F.trim("text"), r"\s+"))
                )
            ).alias("tk"),
        )
        .collect()
    }
    packed = corpus_pack_tokens(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in packed:
        nd, tk, bins = by_lang.setdefault(r.lang, [0, 0, set()])
        by_lang[r.lang] = [nd + r.n_docs, tk + r.sum_tokens, bins | {r.seq_bin}]
    for lang, (nd, tk) in totals.items():
        assert by_lang[lang][0] == nd
        assert by_lang[lang][1] == tk
        assert 0 in by_lang[lang][2]


def test_temperature_weights_compress_ratios(spark, sf_dir):
    """tau=0.5 must compress the language imbalance: the head/tail
    share ratio is strictly smaller than the raw count ratio, weights
    are monotone in counts, and floored shares sum to <= 1e6 with
    bounded loss."""
    rows = corpus_temperature_weights(spark, sf_dir).collect()
    rows.sort(key=lambda r: r.n_docs)
    for a, b in zip(rows, rows[1:]):
        assert a.w_e6 <= b.w_e6
    lo, hi = rows[0], rows[-1]
    if lo.n_docs < hi.n_docs:
        assert hi.share_e6 / lo.share_e6 < hi.n_docs / lo.n_docs
    total_share = sum(r.share_e6 for r in rows)
    assert 1_000_000 - len(rows) <= total_share <= 1_000_000


def test_dedup_incremental_equals_global_dedup_restricted(spark, sf_dir):
    """A batch survivor is exactly a batch doc that is the min-id
    holder of its hash among (batch ∪ history-hash-coverage): recompute
    the expected set in Python from raw normalized hashes."""
    import re

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    norm = lambda t: hashlib.md5(  # noqa: E731
        re.sub(r"\s+", " ", t.strip().lower()).encode()
    ).hexdigest()
    hist_hashes = {norm(r.text) for r in docs if r.doc_id % 5 != 0}
    batch = sorted(
        ((r.doc_id, norm(r.text)) for r in docs if r.doc_id % 5 == 0)
    )
    seen: set = set()
    expect = set()
    for doc_id, h in batch:
        if h not in hist_hashes and h not in seen:
            expect.add(doc_id)
        seen.add(h)
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import dedup_incremental

    got = {r.doc_id for r in dedup_incremental(spark, sf_dir).collect()}
    assert got == expect


def test_bigram_lm_probabilities_well_formed(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        _LM_MIN_CONTEXT,
        text_bigram_lm,
    )

    rows = text_bigram_lm(spark, sf_dir).collect()
    assert rows, "fixture corpus must yield at least one context"
    for r in rows:
        assert 1 <= r.c <= r.n
        assert r.n >= _LM_MIN_CONTEXT
        assert r.p_e4 == r.c * 10000 // r.n
    assert len({r.w1 for r in rows}) == len(rows)  # one argmax per context


def test_binaryfile_roundtrip_is_byte_identical(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.extensions import (
        source_binaryfile_roundtrip,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .collect()
    }
    got = {r.doc_id: (r.n_bytes, r.content_md5) for r in
           source_binaryfile_roundtrip(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        raw = text.encode() + b"\n"
        assert got[doc_id] == (len(raw), hashlib.md5(raw).hexdigest()), doc_id


def test_attribution_matches_bruteforce(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.behavioral import (
        events_attribution,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).collect()
    clicks: dict = {}
    for r in ev:
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append(r.ts)
    got = {r.event_id: r.click_us for r in events_attribution(spark, sf_dir).collect()}
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    us = lambda t: (t - epoch) // datetime.timedelta(microseconds=1)  # noqa: E731
    n_purchases = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        n_purchases += 1
        prior = [t for t in clicks.get(r.user_id, []) if t <= r.ts]
        expect = us(max(prior)) if prior else None
        assert got[r.event_id] == expect, r.event_id
    assert len(got) == n_purchases


def test_embedding_norm_stats_fixed_point_exact(spark, sf_dir):
    import math

    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        embedding_norm_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    norms: dict = {}
    for r in emb:
        n2 = sum(
            int(math.floor(float(x) * 1_000_000)) ** 2 for x in r.embedding
        )
        norms.setdefault(r.label, []).append(n2)
    got = {r.label: r for r in embedding_norm_stats(spark, sf_dir).collect()}
    assert set(got) == set(norms)
    for label, vals in norms.items():
        g = got[label]
        assert g.n_vecs == len(vals)
        assert g.min_norm2_e12 == min(vals)
        assert g.max_norm2_e12 == max(vals)
        assert g.avg_norm2_e12 == sum(vals) // len(vals)


def test_q6_predicates_reach_parquet_scan(spark, sf_dir):
    """Q6's plan IS its pushdown: the date/discount/quantity filters
    must appear as PushedFilters on the parquet scan, and the read
    schema must carry only the four referenced columns."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.tpch import (
        tpch_q6_forecast_revenue,
    )

    plan = _plan(tpch_q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters: [" in plan, plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_extendedprice" in schema
    for col in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert col not in schema, schema


def test_pit_join_matches_exactly_once(spark, sf_dir):
    """SCD2 intervals tile [first_change, ∞) per customer, so every
    probe row (order + 45d) must match exactly one dimension row, and
    the matched interval must actually contain the probe date."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.tpch import (
        join_point_in_time,
    )

    n_orders = load_table(spark, sf_dir, "orders").count()
    rows = join_point_in_time(spark, sf_dir).collect()
    assert len(rows) == n_orders
    assert len({r.o_orderkey for r in rows}) == n_orders
    for r in rows[:200]:
        assert r.valid_from <= r.asof_date


def test_stream_cdc_state_equals_batch_argmax(spark, sf_dir):
    """The incrementally-merged streaming state must equal the batch
    argmax over the whole feed — batch-order independence and
    lost-update freedom in one equality."""
    from pyspark.sql import Window

    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
        stream_cdc_upsert_to_state,
    )

    state = stream_cdc_upsert_to_state(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    expect = (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    got = {(r.user_id, r.event_id) for r in state.collect()}
    want = {(r.user_id, r.event_id) for r in expect.collect()}
    assert got == want
