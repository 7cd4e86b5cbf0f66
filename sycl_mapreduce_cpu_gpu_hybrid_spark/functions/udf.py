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


def register_top_words_udtf(
    spark: SparkSession, name: str = "top_words", use_arrow: bool = False
):
    """Python UDTF (table function, Spark 4 §2.9 surface): one input
    row -> many output rows, the user-kernel analog of the reference's
    map functor *emitting multiple records* per element — the one
    extension-point shape scalar/agg UDFs can't express. Deterministic
    by construction (count-desc, word-asc tiebreak) so the whole
    Python path rides the DuckDB value-hash oracle.

    ``use_arrow=True`` registers the same kernel Arrow-optimized:
    rows cross the JVM/Python boundary in Arrow record batches instead
    of pickled rows (the UDTF counterpart of pandas_udf vs plain udf)
    — same results, the faster transport for wide fan-out."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, word string, cnt bigint, rnk int",
        useArrow=use_arrow,
    )
    class TopWords:
        def eval(self, doc_id, text):
            from collections import Counter

            toks = [t for t in re.split(r"\s+", (text or "").strip().lower()) if t]
            best = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            for i, (w, c) in enumerate(best):
                yield doc_id, w, c, i + 1

    spark.udtf.register(name, TopWords)
    return TopWords


# --- stock kernels ----------------------------------------------------------


def vowel_ratio_series(s: pd.Series) -> pd.Series:
    """Vowel fraction of each string — deliberately SQL-replicable so
    the Python kernel path itself is oracle-checkable."""
    total = s.str.len().clip(lower=1)
    vowels = s.str.count(r"[aeiou]")
    return (vowels / total).astype("float64")


def vowel_ratio_udf():
    return pandas_udf(vowel_ratio_series, returnType="double")
