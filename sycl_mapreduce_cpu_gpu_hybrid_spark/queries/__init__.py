"""Declared query inventory — the engine's user-facing query surface.

Each submodule exposes ``QUERIES`` (name -> fn(spark, sf_dir) ->
DataFrame, written with the DataFrame API so Catalyst plans them) and
``ORACLES`` (name -> ANSI SQL DuckDB runs over the same parquet for the
driver's correctness gate; queries without an oracle get the weaker
rows-only check). Names are unique across submodules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import extensions, kmerq, llm, relational, scalars

_MODULES = [kmerq, relational, scalars, llm, extensions]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Declared queries, ORACLED-FIRST: every query with a DuckDB
    oracle precedes every rows-only one, so a driver that evaluates a
    bounded prefix of the inventory always covers the full value-hash
    surface before the (weaker) rows-only checks."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    oracled = all_oracles()
    return {
        **{k: v for k, v in out.items() if k in oracled},
        **{k: v for k, v in out.items() if k not in oracled},
    }


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
