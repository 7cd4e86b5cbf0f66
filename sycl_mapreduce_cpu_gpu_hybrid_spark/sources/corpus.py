"""Corpus ingest ETL — the reference's pre-engine shell pipeline as
DataFrame ops (SURVEY.md §1.4):

1. normalize: strip FASTA '>' header lines + newlines → one string per
   file (scripts/modifier.sh:15-20),
2. truncate: cut each document to its first N chars
   (scripts/truncator.sh:14-20),
3. load: one row per file (src/helper.cpp:21-39).

All three are narrow, codegen'd transformations; at 100 TB the heavy
lifting is the text scan itself, which Spark splits by file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def strip_fasta(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Drop '>' header lines and strip CR/LF (modifier.sh:19:
    ``grep -v "^>" | tr -d '\\n\\r'``)."""
    return lines.where(~F.col(value_col).startswith(">")).select(
        F.regexp_replace(F.col(value_col), r"[\r\n]", "").alias(value_col),
        *[c for c in lines.columns if c != value_col],
    )


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of text files into DataFrame[doc_id, text] —
    one row per file (src/helper.cpp:21-39), FASTA headers stripped.

    Line-based read + groupBy(file) reassembly rather than
    wholeTextFiles: keeps the scan splittable for very large files.
    Line order within a file is preserved via the line offset.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("doc_id"),
            F.monotonically_increasing_id().alias("_line_id"),
            F.col("value"),
        )
    )
    kept = lines.where(~F.col("value").startswith(">"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("_line_id", "value"))), lambda s: s["value"])
            ).alias("text")
        )
        .select(F.regexp_extract("doc_id", r"([^/]+?)(\.[^./]*)?$", 1).alias("doc_id"), "text")
    )


def truncate_docs(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Reference truncator.sh:17-19 — head-N-chars per document."""
    return docs.withColumn(text_col, F.substring(F.col(text_col), 1, n))
