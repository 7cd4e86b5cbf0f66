"""The reference's own query family: k-mer count / total
(src/main.cpp:143-245 dataflow; sink filter src/main.cpp:65)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.kmer import kmer_count, total_kmers
from ..sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def kmer_count_k4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmer_count(_docs(spark, sf_dir), k=4, min_count=2)


def kmer_count_k8_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmer_count(_docs(spark, sf_dir), k=8, min_count=1)


def kmer_total_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_kmers(_docs(spark, sf_dir), k=5)


QUERIES = {
    "kmer_count_k4": kmer_count_k4,
    "kmer_count_k8_all": kmer_count_k8_all,
    "kmer_total_k5": kmer_total_k5,
}

ORACLES = {
    "kmer_count_k4": """
        SELECT word, count(*) AS cnt
        FROM (
            SELECT substr(text, unnest(generate_series(1, length(text) - 3)), 4) AS word
            FROM documents WHERE length(text) >= 4
        )
        GROUP BY word
        HAVING count(*) >= 2
    """,
    "kmer_count_k8_all": """
        SELECT word, count(*) AS cnt
        FROM (
            SELECT substr(text, unnest(generate_series(1, length(text) - 7)), 8) AS word
            FROM documents WHERE length(text) >= 8
        )
        GROUP BY word
    """,
    "kmer_total_k5": """
        SELECT CAST(coalesce(sum(greatest(length(text) - 4, 0)), 0) AS BIGINT) AS total
        FROM documents
    """,
}
