"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these helpers cover the two cases it does not:

- **Salted two-phase aggregation** — a groupBy where a handful of keys
  dominate hashes each input row to one of ``n_salts`` sub-keys,
  aggregates partially per (key, salt), then merges the ``n_salts``
  partials per key. The first shuffle spreads a hot key over
  ``n_salts`` reducers; the second moves only |keys| x n_salts rows.
  Works for any algebraic aggregate (sum/count/min/max here).

  The salt is a content hash of the full row: deterministic, so task
  retries re-produce identical partials (rand() salts do not
  guarantee that for non-idempotent sinks). Caveat: *identical* rows
  share a salt — if a hot key's rows are also all duplicates of each
  other, content salting cannot spread them; that shape needs a
  nondeterministic salt and an idempotent sink.
- **Salted broadcast replication join** — for a skewed large side
  joining a small side that is broadcastable: explode the small side
  ``n_salts`` ways and salt the large side's key, so each hot key's
  rows split across ``n_salts`` tasks. (With a true broadcast join
  Spark never shuffles the large side at all, which is the first
  choice; the salted form exists for when the small side is just over
  the broadcast threshold and a shuffle join must be used.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_group_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation. ``agg_cols`` maps column -> one of
    sum/count/min/max (algebraic, so partials merge exactly)."""
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for agg in agg_cols.values():
        if agg not in mergers:
            raise ValueError(f"non-algebraic aggregate: {agg}")

    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_cols, _SALT).agg(
        *[firsts[agg](c).alias(f"_p_{c}") for c, agg in agg_cols.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            mergers[agg](f"_p_{c}").alias(f"{agg}_{c}")
            for c, agg in agg_cols.items()
        ]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Shuffle join with the large side's hot keys split ``n_salts``
    ways; the small side is replicated ``n_salts`` times (explode) so
    every (key, salt) partition finds its match."""
    lg = large.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    sm = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lg.join(sm, [on, _SALT]).drop(_SALT)


def top_heavy_keys(
    df: DataFrame, key: str, min_frac: float = 0.01
) -> DataFrame:
    """Diagnostic: keys carrying more than ``min_frac`` of all rows —
    the candidates that need salting/AQE skew handling."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= total * min_frac)
        .select(key, "n", F.round(F.col("n") / total, 4).alias("frac"))
    )
