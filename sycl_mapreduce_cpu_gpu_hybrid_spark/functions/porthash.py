"""Portable 64-bit hashing: identical values in Spark and DuckDB.

xxhash64 (the engine's default content hash — JVM-built-in, fastest)
has no DuckDB counterpart, which forces hash-dependent operators
(MinHash, winnowing) down to rows-only correctness checks. This
module trades speed for portability: the first 15 hex chars of md5
parsed as a base-16 integer — a 60-bit, strictly non-negative value
both engines compute bit-identically (non-negativity matters: it
keeps min/ordering semantics identical between Spark's signed LongType
and any unsigned reinterpretation).

Use xxhash64 in production pipelines; use these in declared queries
whose DuckDB oracle must replicate the hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: cannot appear in the fixtures' text


def portable_hash64(col: Column | str, seed: int = 0) -> Column:
    """Spark side: 60-bit md5-derived hash of ``col`` under ``seed``."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(c, F.lit(f"{SEP}{seed}")) if seed else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB side: the same value as :func:`portable_hash64`."""
    salted = f"({expr} || '{SEP}{seed}')" if seed else expr
    return f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"


def rademacher_matrix(n_rows: int, n_cols: int, tag: str = "plane") -> list[list[int]]:
    """Deterministic ±1 matrix derived from md5 — the shared-constants
    source for portable random-hyperplane LSH: the Spark projection
    kernel and the generated DuckDB oracle both consume THIS matrix,
    so the two can never drift (same pattern as the portable hash
    family above). Entry (i, j) is the sign of the first hex nibble of
    md5('{tag}:{i}:{j}')."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{tag}:{i}:{j}".encode()).hexdigest()[0], 16) >= 8 else -1
            for j in range(n_cols)
        ]
        for i in range(n_rows)
    ]
