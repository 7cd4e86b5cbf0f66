"""As-of (temporal) join — an operator Spark lacks natively
(SURVEY.md §2.5 ∅ row: range/as-of joins).

For each left row (k, t) return the right row with the same key and
the greatest right timestamp <= t (direction='backward'; 'forward' is
the mirror). Implemented as the union + sorted-window trick:

    tag sides -> unionByName -> window(partitionBy key, orderBy ts)
    -> last(right value, ignorenulls) over an unbounded-preceding
    frame -> keep left rows

which costs ONE shuffle (the window's hash partition by key + in-
partition sort) regardless of match multiplicity. The naive
alternative — inequality join then per-left-row max — explodes to
|left| x |matching rights| intermediate rows before re-aggregating;
at 100 TB with hot keys that is quadratic. The union+window plan's
state per key is a single running value, and Spark's window sort
spills, so skewed keys degrade to disk, not OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Every left row survives; matched right columns
    appear as ``<col><suffix>`` (NULL when no right row qualifies).

    direction='backward': latest right with right_ts <= left_ts.
    direction='forward':  earliest right with right_ts >= left_ts.
    ``allow_exact_matches=False`` makes the inequality strict.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    out_names = {c: f"{c}{suffix}" for c in right_cols}

    rtypes = dict(right.dtypes)
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(rtypes[c]).alias(out_names[c]) for c in right_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    for c in left.columns:
        if c not in on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l_tagged.unionByName(r_tagged)

    # sort so the qualifying right rows precede each left row:
    # backward+exact: (ts asc, right first at equal ts);
    # backward+strict: (ts asc, left first) — equal-ts rights invisible;
    # forward: mirrored with ts desc.
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in left.columns],
        F.col(_SIDE).alias(_SIDE),
        *[
            F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c])
            for c in right_cols
        ],
    )
    return filled.where(F.col(_SIDE) == 1).drop(_SIDE)
