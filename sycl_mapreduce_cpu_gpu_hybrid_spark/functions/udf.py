"""User-kernel registration surface (SURVEY.md §2.9).

The reference's extension points are a map functor emitting records
and an associative combiner (``Mapped::operator+``,
src/GPU_Module/GPU.cpp:20-27); their Spark-native equivalents are a
scalar pandas_udf (vectorized map) and a GROUPED_AGG pandas_udf
(custom combiner). Both cross the JVM/Python boundary in Arrow
batches — the acceptable slow path; the built-in function packs stay
JVM-side and should always be preferred where expressible.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def register_scalar_kernel(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register a vectorized (Arrow-batched) scalar kernel usable from
    both the DataFrame API and SQL. ``fn`` maps pandas Series ->
    pandas Series, one call per Arrow batch — never per row."""
    udf = pandas_udf(fn, returnType=return_type)
    spark.udf.register(name, udf)
    return udf


def register_grouped_agg_kernel(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register a custom aggregate kernel (the ``Mapped::operator+``
    combiner concept): ``fn`` maps pandas Series -> scalar, applied
    per group."""
    udf = pandas_udf(fn, returnType=return_type, functionType=F.PandasUDFType.GROUPED_AGG)
    spark.udf.register(name, udf)
    return udf


# --- stock kernels ----------------------------------------------------------


def vowel_ratio_series(s: pd.Series) -> pd.Series:
    """Vowel fraction of each string — deliberately SQL-replicable so
    the Python kernel path itself is oracle-checkable."""
    total = s.str.len().clip(lower=1)
    vowels = s.str.count(r"[aeiou]")
    return (vowels / total).astype("float64")


def vowel_ratio_udf():
    return pandas_udf(vowel_ratio_series, returnType="double")
