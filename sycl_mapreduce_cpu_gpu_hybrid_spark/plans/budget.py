"""Shared budget gate for bounded driver-local fast paths.

Several operators carry a cost-based driver-local tier next to their
distributed plan — connected components' union-find
(operators/dedup.py), PageRank's numpy replay (operators/graph.py)
and the trade-graph edge build (queries/relational.py), and
graph_triangles' dense-gemm counter (queries/behavioral.py). Each
tier is bounded (metadata probe or count-first probe), bit-identical
to its distributed twin, and falls through past its ceiling — the
same cost-based tiering any engine's planner does for a build side
that fits memory.

This module is the ONE place the gate decision lives, so every tier
provably keeps its at-scale twin honest:

- :func:`within_budget` / :func:`local_tier_enabled` are the only
  gate predicates tiers may use;
- the ``SMRGH_FORCE_DISTRIBUTED`` environment variable switches every
  local tier off at once, forcing the distributed twins end-to-end —
  tests/test_budget_tiers.py runs the equality suites under the
  switch every round, so a tier can never drift from the plan that
  has to work at 100 TB.

(similarity._collect_matrix intentionally does NOT route through
here: it is a *contract* on small-by-definition query/centroid sets —
it raises above its ceiling instead of falling through, because a
driver-uncollectable query set has no distributed twin to fall back
to.)
"""

from __future__ import annotations

import os

FORCE_DISTRIBUTED_ENV = "SMRGH_FORCE_DISTRIBUTED"


def force_distributed() -> bool:
    """True when the env switch disables every driver-local tier."""
    return os.environ.get(FORCE_DISTRIBUTED_ENV, "") not in ("", "0")


def local_tier_enabled(ceiling: int) -> bool:
    """May a driver-local tier even probe? (ceiling > 0 and the
    forced-distributed switch is off). Count-first probe sites call
    this BEFORE launching their probe job, so the forced run doesn't
    pay probes for a tier it will never take."""
    return ceiling > 0 and not force_distributed()


def within_budget(bound: int | None, ceiling: int) -> bool:
    """True iff a driver-local tier may run on a KNOWN bound: the
    (metadata- or count-derived) bound fits the ceiling and the
    forced-distributed switch is off."""
    return (
        not force_distributed()
        and bound is not None
        and ceiling > 0
        and 0 <= bound <= ceiling
    )


_TABLE_ROWS_CACHE: dict[tuple[str, str], int] = {}


def table_rows(sf_dir: str, table: str, df=None) -> int:
    """Memoized row count for ``{sf_dir}/{table}.parquet`` from the
    parquet FOOTER (O(files) metadata, zero Spark jobs at declaration
    time). Falls back to a Spark count when the source isn't a local
    single-file parquet table (e.g. a view-backed test sf_dir) and a
    DataFrame was provided."""
    key = (sf_dir, table)
    if key not in _TABLE_ROWS_CACHE:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isfile(path):
            import pyarrow.parquet as _pq

            _TABLE_ROWS_CACHE[key] = _pq.read_metadata(path).num_rows
        elif df is not None:
            _TABLE_ROWS_CACHE[key] = df.count()
        else:
            raise FileNotFoundError(path)
    return _TABLE_ROWS_CACHE[key]
