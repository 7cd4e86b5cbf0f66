"""Property-based tests (hypothesis): generated corpora instead of
fixtures, few examples (each example is a Spark job) but adversarial
shapes — empty docs, docs shorter than k, slice-boundary lengths,
repeated characters. The reference's oracle-diff strategy (SURVEY §5)
applied to generated rather than fixed inputs."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.oracle import python_kmer_oracle
from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.kmer import kmer_count

DOC = st.text(alphabet="ACGT", min_size=0, max_size=40)
SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(corpus=st.lists(DOC, min_size=1, max_size=8), k=st.integers(2, 6))
@SLOW
def test_kmer_count_matches_oracle_on_generated_corpora(spark, corpus, k):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["word"]: r["cnt"]
        for r in kmer_count(docs, k, min_count=1).collect()
    }
    want = python_kmer_oracle(corpus, k)
    assert got == want


@given(
    a=st.text(alphabet="abcdef ", min_size=20, max_size=60),
    b=st.text(alphabet="abcdef ", min_size=20, max_size=60),
)
@SLOW
def test_ngram_jaccard_matches_python(spark, a, b):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    k = 3
    docs = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    # df cap of 1.0 keeps every shingle (2 docs — no stop-shingle cut)
    rows = ngram_jaccard_pairs(
        docs, k=k, threshold=0.0, max_doc_freq_frac=1.0
    ).collect()

    sa = {a[i : i + k] for i in range(len(a) - k + 1)}
    sb = {b[i : i + k] for i in range(len(b) - k + 1)}
    if not (sa and sb and sa & sb):
        assert rows == []
    else:
        assert len(rows) == 1
        want = len(sa & sb) / len(sa | sb)
        # replicate Spark's F.round exactly: shortest-repr decimal,
        # HALF_UP ties — Python's built-in round() is half-to-even and
        # disagrees on exact ties like 0.03125 (hypothesis found one)
        from decimal import ROUND_HALF_UP, Decimal

        want_r = float(
            Decimal(repr(want)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )
        assert rows[0]["jaccard"] == want_r


@given(corpus=st.lists(DOC.filter(lambda t: len(t) >= 4), min_size=2, max_size=6))
@SLOW
def test_total_kmers_identity_generated(spark, corpus):
    # sum over all counted k-mers == sum over docs of (len - k + 1)
    k = 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    total = (
        kmer_count(docs, k, min_count=1)
        .agg(F.sum("cnt").alias("s"))
        .collect()[0]["s"]
    )
    assert total == sum(len(t) - k + 1 for t in corpus if len(t) >= k)


def test_minhash_estimates_jaccard(spark):
    # not hypothesis (needs a sizeable signature to converge): planted
    # pair with known shingle overlap; the xor-rotate family's
    # estimate must land near exact Jaccard
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base[:-10] + " xyz edit!"
    docs = spark.createDataFrame(
        [(0, base), (1, near)], "doc_id long, text string"
    )
    k = 6
    sa = Counter(base[i : i + k] for i in range(len(base) - k + 1))
    sb = Counter(near[i : i + k] for i in range(len(near) - k + 1))
    exact = len(set(sa) & set(sb)) / len(set(sa) | set(sb))
    rows = minhash_lsh_pairs(docs, k=k, num_hashes=64, bands=16, threshold=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0]["est_jaccard"] - exact) < 0.15


# --- behavioral family: funnel vs a pure-python reference ------------------

_EVENT_TYPES = ["view", "click", "purchase", "error"]


def _python_funnel(rows):
    """Reference implementation of the strict-order funnel over
    (user, ts, type) triples — mirrors queries/behavioral.events_funnel."""
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    n_view = n_click = n_purchase = 0
    for evs in by_user.values():
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        if t1 is None:
            continue
        n_view += 1
        t2 = min((t for t, ty in evs if ty == "click" and t > t1), default=None)
        if t2 is None:
            continue
        n_click += 1
        t3 = min(
            (t for t, ty in evs if ty == "purchase" and t > t2), default=None
        )
        if t3 is not None:
            n_purchase += 1
    return n_view, n_click, n_purchase


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),          # few users -> dense per-user paths
            st.integers(0, 20),         # coarse ts -> deliberate ties
            st.sampled_from(_EVENT_TYPES),
        ),
        min_size=1,
        max_size=30,
    )
)
@SLOW
def test_funnel_matches_python_reference(spark, rows):
    import datetime as dt

    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import behavioral

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(hours=t), ty) for u, t, ty in rows],
        "user_id long, ts timestamp, event_type string",
    )
    orig = behavioral.load_table
    behavioral.load_table = lambda s, d, n: df
    try:
        out = behavioral.events_funnel(spark, "unused").collect()[0]
    finally:
        behavioral.load_table = orig
    want = _python_funnel(rows)
    assert (out["n_view"], out["n_click"], out["n_purchase"]) == want
