"""Benchmark decontamination (operators/decontam.py) and repetition
signals (functions/text.py repetition_profile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.text import repetition_profile
from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
    word_ngram_array,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table


def test_word_ngram_array_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, ""), (4, "  x   y  z ")],
        "id bigint, text string",
    )
    rows = {r["id"]: r["g"] for r in df.select("id", word_ngram_array("text", 3).alias("g")).collect()}
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == []  # fewer than n tokens -> empty, not [1,0] descent
    assert rows[3] == []
    assert rows[4] == ["x y z"]  # whitespace normalized first


def test_contamination_and_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words here entirely novel text"),
            (3, "quick brown fox jumps high"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps somewhere")], "doc_id bigint, text string"
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(corpus, bench, n=4).collect()
    }
    # shared 4-grams with bench: doc1 has 'quick brown fox jumps';
    # doc3 has the same one; doc2 none
    assert hits == {1: 1, 3: 1}
    clean = decontaminate(corpus, bench, n=4, min_hits=1)
    assert [r["doc_id"] for r in clean.collect()] == [2]
    # min_hits above the overlap keeps everything
    assert decontaminate(corpus, bench, n=4, min_hits=2).count() == 3


def test_gram_keys_frame_token_boundaries(spark):
    """r15: contamination_hits keys grams on xxhash64 over the n token
    columns instead of the joined gram string. The running-seed
    construction must FRAME each token — ('ab','c') and ('a','bc')
    concatenate identically but are different 2-grams, so they must
    not collide (a framing bug would silently inflate n_hits on real
    text). Also pins that per-doc key distinctness still dedups
    repeated grams (doc 1's 'ab c' appears twice -> n_hits 1)."""
    corpus = spark.createDataFrame(
        [(1, "ab c x ab c"), (2, "a bc")], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame(
        [(100, "ab c")], "doc_id bigint, text string"
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(corpus, bench, n=2).collect()
    }
    # doc 1 shares the 2-gram ('ab','c') (counted once despite two
    # occurrences); doc 2's ('a','bc') must NOT match it
    assert hits == {1: 1}


def test_contamination_shuffle_path_matches_broadcast(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    a = sorted(map(tuple, contamination_hits(corpus, bench, n=4, broadcast_bench=True).collect()))
    b = sorted(map(tuple, contamination_hits(corpus, bench, n=4, broadcast_bench=False).collect()))
    assert a == b and len(a) > 0


def test_repetition_profile_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),        # bigrams: 'a a','a a','a b' -> 1 dup; top 'a'=3
            (2, "x"),              # no bigrams
            (3, "p q p q p"),      # bigrams: 'p q','q p','p q','q p' -> 2 dup; top 'p'=3
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", repetition_profile("text").alias("rep"))
        .select("doc_id", "rep.*")
        .collect()
    }
    assert (out[1]["n_words"], out[1]["n_bigrams"], out[1]["n_dup_bigrams"], out[1]["top_word_count"]) == (4, 3, 1, 3)
    assert (out[2]["n_words"], out[2]["n_bigrams"], out[2]["top_word_count"]) == (1, 0, 1)
    assert (out[3]["n_dup_bigrams"], out[3]["top_word_count"]) == (2, 3)


def test_repetition_no_shuffle_plan(spark, sf_dir):
    """The whole repetition profile is expression work: the physical
    plan must contain no Exchange — and exactly ONE tokenization
    (r15: the struct's fields used to inline the regexp+split up to
    17x per row; the single-element-transform binding pins it to 1)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        docs.select("doc_id", repetition_profile("text").alias("rep"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("regexp_replace") == 1
