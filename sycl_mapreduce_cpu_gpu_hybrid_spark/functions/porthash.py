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


# Largest prime below 2^30: the affine-permutation modulus for
# portable MinHash. 30 bits keeps a_i * (h mod p) + b_i (< 2^60+2^30)
# inside int64 under ANSI arithmetic; a 30-bit hash domain is ample
# for MinHash (birthday collision odds for ~10^3 shingles/doc are
# ~0.4% per doc, vanishing effect on a min).
MINHASH_PRIME = 1_073_741_789


def minhash_affine_coeffs(n: int, tag: str = "mh") -> list[tuple[int, int]]:
    """``n`` independent affine-permutation coefficient pairs
    (a_i in [1, p), b_i in [0, p)) derived deterministically from md5
    of counter strings — the classic portable MinHash family (the
    same construction Spark MLlib's MinHashLSH uses with RNG-drawn
    coefficients): shingle hashed ONCE, component i applies
    ``(a_i * (h mod p) + b_i) mod p``. Independence ACROSS components
    comes from independent (a_i, b_i) constants; deriving both values
    per-shingle instead (a Carter-Wegman pair shared by all i)
    correlates the component argmins and biases pairwise estimates —
    measured +0.25 est error on planted corpora — which is why this
    shared-constants form replaced it. Rendered into the DuckDB
    oracle as literals (queries/llm.py), same pattern as
    rademacher_matrix below."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        (1 + h(f"{tag}:{i}:a") % (MINHASH_PRIME - 1), h(f"{tag}:{i}:b") % MINHASH_PRIME)
        for i in range(n)
    ]


def portable_base_hash(col: Column | str) -> Column:
    """Spark side of the portable MinHash base hash: the 60-bit md5
    value reduced mod :data:`MINHASH_PRIME` — ONE md5 per shingle
    regardless of how many affine components derive from it."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_PRIME)
    )


def portable_base_hash_sql(expr: str) -> str:
    """DuckDB side of :func:`portable_base_hash` (operands are
    non-negative, so ``%`` agrees between the engines)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT) % {MINHASH_PRIME}"


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
