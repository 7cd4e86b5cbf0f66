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


# Largest prime below 2^30: the Carter-Wegman modulus. 30 bits keeps
# every intermediate (a + 63*b with a,b < p) far inside int64 under
# ANSI arithmetic; a 30-bit hash domain is ample for MinHash (birthday
# collision odds for ~10^3 shingles/doc are ~1e-4 per component).
CW_PRIME = 1_073_741_789


def portable_hash64_cw(col: Column | str) -> tuple[Column, Column]:
    """Carter-Wegman base pair from ONE md5: ``(a, b)`` with
    a = (60-bit from hex chars 1-15) mod p, b = 1 + (60-bit from hex
    chars 17-31) mod (p-1), p = :data:`CW_PRIME`. The i-th derived
    hash is ``(a + i * b) % p`` — a pairwise-independent-style family
    in pure int64 arithmetic (max intermediate < 2^36), so n hashes
    cost ONE md5 per value instead of n. b >= 1: the family never
    degenerates to a constant; both a and b span the full modulus, so
    every i reshuffles the min-shingle choice (a bounded ``b`` would
    leave the 60-bit ``a`` spread dominant and every component would
    pick the same argmin — the degenerate trap this construction
    avoids). DuckDB replays via :func:`portable_hash64_cw_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.md5(c)
    h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 17, 15), 16, 10).cast("long")
    return h1 % F.lit(CW_PRIME), h2 % F.lit(CW_PRIME - 1) + F.lit(1)


def portable_hash64_cw_sql(expr: str) -> tuple[str, str]:
    """DuckDB side of :func:`portable_hash64_cw`: the same ``(a, b)``
    SQL expressions over ``expr`` (operands are non-negative, so ``%``
    agrees between the engines)."""
    h1 = f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
    h2 = f"('0x' || substr(md5({expr}), 17, 15))::BIGINT"
    return f"({h1}) % {CW_PRIME}", f"({h2}) % {CW_PRIME - 1} + 1"


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
