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
    ``grep -v "^>" | tr -d '\\n\\r'``). Input column order preserved."""
    return lines.where(~F.col(value_col).startswith(">")).withColumn(
        value_col, F.regexp_replace(F.col(value_col), r"[\r\n]", "")
    )


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of text files into DataFrame[doc_id, text] —
    one row per file (src/helper.cpp:21-39), FASTA headers stripped.

    ``wholetext`` reads each file as a single row, so in-file order is
    preserved by construction (deterministic under task retry — unlike a
    line-level read keyed by monotonically_increasing_id, whose
    partition-indexed ids do not follow byte offsets when a large file
    splits). The reference itself holds whole files in memory
    (src/helper.cpp:25-36), so per-row size == file size matches its
    contract; files are the unit of parallelism, as in the reference's
    one-string-per-file corpus.
    """
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.regexp_extract(
                F.input_file_name(), r"([^/]+?)(\.[^./]*)?$", 1
            ).alias("doc_id"),
            # modifier.sh:19 semantics: drop '>' header lines, then all CR/LF
            F.regexp_replace(
                F.regexp_replace(F.col("value"), r"(?m)^>[^\n]*\n?", ""),
                r"[\r\n]",
                "",
            ).alias("text"),
        )
    )


def truncate_docs(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Reference truncator.sh:17-19 — head-N-chars per document."""
    return docs.withColumn(text_col, F.substring(F.col(text_col), 1, n))
