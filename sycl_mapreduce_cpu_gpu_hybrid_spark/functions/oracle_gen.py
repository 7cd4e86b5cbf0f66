"""Oracle-from-shared-constants: render the Python constants a Spark
expression consumes into DuckDB SQL literals, so hash-bearing declared
queries ship a *generated* oracle that cannot drift from the engine.

The contract (mirrors the reference's generated-golden-answer loop,
scripts/solutiongenerator.py — the oracle is derived from the same
inputs as the system under test, never hand-maintained):

1. Put the constant (stopword table, plane matrix, seed list, ...) in
   ONE Python object.
2. The Spark expression consumes that object directly.
3. The oracle SQL is built by a ``_*_oracle_sql()`` generator that
   renders the SAME object through these helpers.

Anything hand-written in an oracle must be pure relational algebra;
every literal that could drift goes through a renderer here.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from .porthash import portable_hash64_sql  # noqa: F401  (re-export: oracle side of the shared hash)


def sql_literal(v: object) -> str:
    """One Python scalar as a DuckDB literal."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def sql_list(values: Iterable[object]) -> str:
    """A Python sequence as a DuckDB list literal, e.g. ``['a', 'b']``."""
    return "[" + ", ".join(sql_literal(v) for v in values) + "]"


def sql_float_list(values: Iterable[float]) -> str:
    """A numeric sequence as a DuckDB DOUBLE list (``1.0`` not ``1``),
    so list arithmetic stays in float64 exactly like the Spark side."""
    return "[" + ", ".join(f"{float(v)!r}" for v in values) + "]"


def sql_values(
    rows: Iterable[tuple], alias: str, cols: Iterable[str], indent: str = " " * 14
) -> str:
    """A sequence of tuples as an inline ``(VALUES ...) AS alias(cols)``
    table. Tuple elements that are themselves sequences render as list
    literals (DuckDB supports list-typed VALUES)."""

    def cell(v: object) -> str:
        if isinstance(v, (list, tuple)):
            return sql_list(v)
        return sql_literal(v)

    body = f",\n{indent}".join(
        "(" + ", ".join(cell(c) for c in row) + ")" for row in rows
    )
    return f"(VALUES\n{indent}{body}) AS {alias}({', '.join(cols)})"


def sql_values_from_mapping(
    table: Mapping[object, object], alias: str, cols: Iterable[str]
) -> str:
    """A dict constant as a two-column VALUES table (key, value); list
    values become list literals — e.g. ``STOPWORDS`` -> ``l(lang, words)``."""
    return sql_values(list(table.items()), alias, cols)
