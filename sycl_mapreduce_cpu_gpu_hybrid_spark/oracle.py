"""Golden-oracle differencing harness.

Port of the reference's verification strategy
(scripts/verifier.py:22-36): build oracle and engine keyed maps, take
the union of keys, and report per-key missing-left / missing-right /
value-mismatch. Here it is a distributed full-outer-join diff, so it
works at any scale (the reference's dict-based diff is driver-bound).

Also includes the pure-Python k-mer oracle, a direct port of
scripts/solutiongenerator.py:11-28 (per-document sliding windows,
dict increment — windows never span documents).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def python_kmer_oracle(texts: Iterable[str], k: int) -> dict[str, int]:
    """Pure-Python oracle: per-doc windows, dict increment
    (scripts/solutiongenerator.py:14-28)."""
    counts: Counter[str] = Counter()
    for text in texts:
        if text is None:
            continue
        for i in range(len(text) - k + 1):
            counts[text[i : i + k]] += 1
    return dict(counts)


def diff_keyed(
    oracle: DataFrame,
    engine: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Full-outer-join diff on ``key_cols``; one output row per
    discrepancy with a ``status`` of missing_in_oracle /
    missing_in_engine / mismatch (scripts/verifier.py:28-35 semantics:
    silence == pass, i.e. an empty result).
    """
    o = oracle.select(
        *key_cols,
        F.lit(True).alias("_in_oracle"),
        *[F.col(c).alias(f"oracle_{c}") for c in value_cols],
    )
    e = engine.select(
        *key_cols,
        F.lit(True).alias("_in_engine"),
        *[F.col(c).alias(f"engine_{c}") for c in value_cols],
    )
    joined = o.join(e, on=key_cols, how="full_outer")
    # presence markers, not value-NULL sniffing: a legitimately NULL engine
    # value must not read as a missing row
    missing_in_engine = F.col("_in_engine").isNull()
    missing_in_oracle = F.col("_in_oracle").isNull()
    mismatch = F.lit(False)
    for c in value_cols:
        # eqNullSafe: NULL vs non-NULL is a mismatch, NULL vs NULL is equal
        mismatch = mismatch | ~F.col(f"oracle_{c}").eqNullSafe(F.col(f"engine_{c}"))
    status = (
        F.when(missing_in_engine & missing_in_oracle, F.lit("impossible"))
        .when(missing_in_engine, F.lit("missing_in_engine"))
        .when(missing_in_oracle, F.lit("missing_in_oracle"))
        .when(mismatch, F.lit("mismatch"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .drop("_in_oracle", "_in_engine")
    )


def assert_matches(
    oracle: DataFrame,
    engine: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    max_show: int = 20,
) -> None:
    """Raise AssertionError with a sample of discrepancies if any."""
    diffs = diff_keyed(oracle, engine, key_cols, value_cols)
    rows = diffs.limit(max_show).collect()
    if rows:
        n = diffs.count()
        lines = "\n".join(str(r.asDict()) for r in rows)
        raise AssertionError(f"{n} oracle discrepancies, first {len(rows)}:\n{lines}")
