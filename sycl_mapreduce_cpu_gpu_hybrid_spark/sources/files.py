"""CSV / JSON file sources and sinks (SURVEY §2.1 ∅ row).

The reference reads only a directory of plain text
(src/helper.cpp:21-39); CSV/JSON are additive engine surface. Two
scale rules are baked in rather than left to callers:

- **Explicit schemas only.** ``inferSchema``/JSON schema inference
  scans the whole input once before the real job — at 100 TB that is
  a second full pass. Readers here require a schema (or take one from
  a sample ``schema_of`` helper run on a bounded sample).
- **Spark-native line splitting.** Multi-file CSV/JSON parallelize per
  file and per split; no driver-side reading anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan with a mandatory explicit schema (no inference pass)."""
    return (
        spark.read.options(header=str(header).lower(), **options)
        .schema(schema)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options
) -> DataFrame:
    """JSON-lines scan with a mandatory explicit schema."""
    return spark.read.options(**options).schema(schema).json(path)


def sample_schema(
    spark: SparkSession, path: str, fmt: str, sample_files: int = 1, **options
) -> StructType:
    """Bounded schema discovery: infer from the first ``sample_files``
    files only, for interactive use — production jobs should pin the
    returned schema, not re-run this."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        files = sorted(
            f
            for f in _glob.glob(_os.path.join(path, "*"))
            # skip commit markers / hidden metadata (_SUCCESS, .crc)
            if not _os.path.basename(f).startswith(("_", "."))
        )[:sample_files]
    else:
        files = [path]
    reader = spark.read.options(**options)
    if fmt == "csv":
        return reader.option("inferSchema", "true").option("header", "true").csv(files).schema
    if fmt == "json":
        return reader.json(files).schema
    raise ValueError(f"unsupported format: {fmt}")


def write_csv(df: DataFrame, path: str, header: bool = True, **options) -> None:
    df.write.options(header=str(header).lower(), **options).mode(
        "overwrite"
    ).csv(path)


def write_json(df: DataFrame, path: str, **options) -> None:
    df.write.options(**options).mode("overwrite").json(path)
