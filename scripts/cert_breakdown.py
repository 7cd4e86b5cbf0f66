"""Stage breakdown for the LSH recall-certificate queries (r7 verdict
task 4): times each side of dedup_minhash_pairs / dedup_simhash_pairs
separately — candidate generation (banded LSH), truth
(sampled exact ngram-Jaccard), and the full certificate — against the
DuckDB oracle replay, which computes ONLY the truth count (the
candidate set is hash-family-specific and has no oracle twin). The
asymmetry is therefore structural: Spark's side includes the whole
production LSH pipeline the oracle never runs.

    python scripts/cert_breakdown.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sycl_mapreduce_cpu_gpu_hybrid_spark.session import get_spark  # noqa: E402
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)


def _t(fn, reps: int = 2) -> float:
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="cert_breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import _truth_sample

    docs = load_table(spark, sf_dir, "documents")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    truth = ngram_jaccard_pairs(
        _truth_sample(docs), k=6, threshold=0.9,
        max_doc_freq_frac=1.0, max_doc_freq_abs=None,
    ).select("a", "b")
    stages = {
        "minhash_candidates": minhash_lsh_pairs(
            docs, k=6, num_hashes=64, bands=16, threshold=0.7
        ).select("a", "b"),
        "simhash_candidates": simhash_near_pairs(docs, max_hamming=3).select(
            "a", "b"
        ),
        "truth_sampled_jaccard": truth,
        "full_cert_minhash": em.queries()["dedup_minhash_pairs"].__wrapped__(
            spark, sf_dir
        ),
        "full_cert_simhash": em.queries()["dedup_simhash_pairs"].__wrapped__(
            spark, sf_dir
        ),
    }
    for name, df in stages.items():
        sec = _t(lambda d=df: force(d))
        print(f"{name:24s} spark={sec:7.3f}s")
        spark.catalog.clearCache()

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{name}.parquet')"
        )
    oracles = em.oracle_sql()
    for q in ("dedup_minhash_pairs", "dedup_simhash_pairs"):
        sec = _t(lambda s=oracles[q]: con.execute(s).fetchall())
        print(f"oracle({q}) duck={sec:7.3f}s  (truth count ONLY — no LSH)")


if __name__ == "__main__":
    main()
