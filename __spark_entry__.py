"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.kmer import (  # noqa: E402
    kmer_count,
    total_kmers,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's k-mer query (map → group-count → sink
    filter count>=2, src/main.cpp:55-73) at k=4 over sf0.001 documents."""
    return kmer_count(_docs(spark, "/root/testdata/sf0.001"), k=4, min_count=2)


# --- query inventory -------------------------------------------------------


def _q_kmer_count_k4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmer_count(_docs(spark, sf_dir), k=4, min_count=2)


def _q_kmer_count_k8_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmer_count(_docs(spark, sf_dir), k=8, min_count=1)


def _q_kmer_total_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_kmers(_docs(spark, sf_dir), k=5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kmer_count_k4": _q_kmer_count_k4,
        "kmer_count_k8_all": _q_kmer_count_k8_all,
        "kmer_total_k5": _q_kmer_total_k5,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
