"""Stage decomposition of the CURRENT (r12 in-row RLE) tfidf plan at a
given fixture: sorted-bigram build -> run-starts -> tf explode ->
df agg -> idf-join+window, each timed warm min-of-3.

    python scripts/stage_split_tfidf_r13.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sycl_mapreduce_cpu_gpu_hybrid_spark.session import (  # noqa: E402
    ensure_driver_memory,
    get_spark,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(label, fn, n=3):
    fn()
    best = min(
        (lambda s: (fn(), time.perf_counter() - s)[1])(time.perf_counter())
        for _ in range(n)
    )
    print(f"  {label:44s} {best:7.3f}s", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    print(f"driver heap: {ensure_driver_memory(SF)}")
    spark = get_spark(app_name="stage_split_tfidf")
    spark.sparkContext.setLogLevel("ERROR")

    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import normalize_text
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        _docs,
        text_tfidf_topterms,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import fan_out

    d = fan_out(_docs(spark, SF))
    dt = d.select("doc_id", F.split(normalize_text("text"), " ").alias("_tk"))
    toks = F.col("_tk")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    t("tokens split only", lambda: noop(dt))
    t("bigrams (unsorted)", lambda: noop(dt.select("doc_id", bigrams.alias("_b"))))
    base = dt.select("doc_id", F.array_sort(bigrams).alias("_sb"))
    t("sorted bigrams (_sb)", lambda: noop(base))
    sb = F.col("_sb")
    nb = F.size(sb)
    starts = F.when(
        nb >= 1,
        F.filter(
            F.sequence(F.lit(1), nb),
            lambda i: (i == 1)
            | (F.element_at(sb, i) != F.element_at(sb, F.greatest(i - 1, F.lit(1)))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    staged = base.select("doc_id", "_sb", starts.alias("_st"))
    t("+ run starts (_st)", lambda: noop(staged))
    stc = F.col("_st")
    run_tf = F.when(
        nb >= 1,
        F.zip_with(
            stc,
            F.concat(
                F.slice(stc, 2, F.greatest(F.size(stc) - 1, F.lit(0))),
                F.array(nb + 1),
            ),
            lambda s, e: F.struct(
                F.element_at(sb, s).alias("term"),
                (e - s).cast("bigint").alias("tf"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<term:string,tf:bigint>>"))
    tf = staged.select("doc_id", F.explode(run_tf).alias("_r")).select(
        "doc_id", F.col("_r.term").alias("term"), F.col("_r.tf").alias("tf")
    )
    t("tf frame (explode)", lambda: noop(tf))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    t("df agg (tf + groupBy term)", lambda: noop(dfc))
    t("FULL text_tfidf_topterms", lambda: noop(text_tfidf_topterms(spark, SF)))
    spark.stop()


if __name__ == "__main__":
    main()
