"""One-off stage decomposition of the r12 perf-weak residuals at a
given fixture (default sf0.1): times each constituent stage of
corpus_decontaminate, text_tfidf_topterms, dedup_embedding_pairs and
embedding_kmeans separately (warm, min-of-3) so SCALING.md entries
carry measured splits, not guesses.

    python scripts/stage_split_r12.py [sf_dir]
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
    fn()  # warm
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
    spark = get_spark(app_name="stage_split")
    spark.sparkContext.setLogLevel("ERROR")

    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.decontam import (
        word_ngram_array,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import _docs
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import fan_out

    print("corpus_decontaminate stages:")
    docs = fan_out(_docs(spark, SF))
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    t("scan only (count cols)", lambda: noop(docs.select("doc_id")))
    t(
        "bench grams distinct (build side alone)",
        lambda: noop(
            bench.select(
                F.explode(word_ngram_array("text", 4)).alias("gram")
            ).distinct()
        ),
    )
    t(
        "corpus grams explode (no join)",
        lambda: noop(
            corpus.select(
                "doc_id",
                F.explode(
                    F.array_distinct(word_ngram_array("text", 4))
                ).alias("gram"),
            )
        ),
    )
    t(
        "corpus tokenize only (split, no grams)",
        lambda: noop(
            corpus.select(
                "doc_id",
                F.size(F.split(F.lower("text"), " ")).alias("n"),
            )
        ),
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        corpus_decontaminate,
    )

    t("FULL corpus_decontaminate", lambda: noop(corpus_decontaminate(spark, SF)))

    print("text_tfidf_topterms stages:")
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import normalize_text

    d = fan_out(_docs(spark, SF))
    toks = F.split(normalize_text("text"), " ")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    terms = d.select("doc_id", F.explode(bigrams).alias("term"))
    t("terms explode only", lambda: noop(terms))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    t("tf groupBy (one shuffle)", lambda: noop(tf))
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        text_tfidf_topterms,
    )

    t("FULL text_tfidf_topterms", lambda: noop(text_tfidf_topterms(spark, SF)))

    print("dedup_embedding_pairs stages:")
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.dedup import (
        embedding_lsh_pairs,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import (
        _EMB_LSH,
        dedup_embedding_pairs,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    t("emb scan", lambda: noop(emb))
    t("FULL dedup_embedding_pairs", lambda: noop(dedup_embedding_pairs(spark, SF)))

    print("embedding_kmeans stages:")
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm import embedding_kmeans

    t("FULL embedding_kmeans (3 passes + 2 barriers)",
      lambda: noop(embedding_kmeans(spark, SF)))

    spark.stop()


if __name__ == "__main__":
    main()
