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

from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.kmer import kmer_count  # noqa: E402
from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's k-mer query (map → group-count → sink
    filter count>=2, src/main.cpp:55-73) at k=4 over sf0.001 documents."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return kmer_count(docs, k=4, min_count=2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
