"""Same-computation DuckDB twin of the Spark banded MinHash-LSH
pipeline (operators/dedup.minhash_lsh_pairs) — an honest ENGINE RACE
row for the dedup_minhash_pairs benchmark (r13 verdict task 3).

The gate oracle for dedup_minhash_pairs is a sampled recall
CERTIFICATE (DuckDB verifies exact Jaccard truth on a bounded doc
sample), so its ratio row compares unequal work. This script makes
DuckDB run the SAME pipeline shape as Spark over the FULL corpus:

    multiset 6-char shingles (no distinct)
 -> 2 base hashes per shingle (h1, h2)
 -> 64 derived components h1 XOR rotl(h2, 1 + i % 63), min-aggregated
    per doc (the signature)
 -> 16 band hashes over 4-component slices
 -> bucket grouping, 2 <= size <= 50 cap
 -> in-bucket pairs, distinct (a, b)
 -> signature rejoin, est = matching components / 64 >= 0.7

Hash FAMILY differs (DuckDB's builtin hash() vs Spark's xxhash64 —
neither engine can evaluate the other's builtin), so output pair sets
are not comparable values; the work per stage is. Timing protocol
matches scripts/ratio_bench.py: 1 warm-up + min-of-2.

    python scripts/lsh_duck_twin.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

K = 6
NUM_HASHES = 64
BANDS = 16
R = NUM_HASHES // BANDS
MAX_BUCKET = 50
THRESHOLD = 0.7


def pipeline_sql(sf_dir: str) -> str:
    rot = lambda i: 1 + (i % 63)  # noqa: E731
    # rotl on UBIGINT without HUGEINT: drop the high bits with a mod,
    # then the multiply provably fits the native width (DuckDB's <<
    # and * are overflow-checked, not wrapping — this is the cheapest
    # wrapping rotate the engine can express)
    comps = ",\n        ".join(
        f"min(xor(h1, ((h2 % {1 << (64 - rot(i))}::UBIGINT)"
        f" * {1 << rot(i)}::UBIGINT)"
        f" | (h2 >> {64 - rot(i)})))"
        f" AS m{i}"
        for i in range(NUM_HASHES)
    )
    band_arms = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"hash(list_value({', '.join(f'm{b * R + j}' for j in range(R))}))"
        f" AS band_hash FROM sigs"
        for b in range(BANDS)
    )
    eq_terms = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END"
        for i in range(NUM_HASHES)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id,
               hash(sub) AS h1,
               hash(reverse(sub)) AS h2
        FROM (
            SELECT doc_id,
                   substr(text, i, {K}) AS sub
            FROM read_parquet('{sf_dir}/documents.parquet'),
                 LATERAL unnest(generate_series(
                     1, greatest(length(text) - {K - 1}, 0))) AS t(i)
        )
    ),
    sigs AS (
        SELECT doc_id,
        {comps}
        FROM sh GROUP BY doc_id
    ),
    banded AS (
        {band_arms}
    ),
    bucket_sizes AS (
        SELECT band_idx, band_hash, count(*) AS n
        FROM banded GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND {MAX_BUCKET}
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM banded x
        JOIN bucket_sizes s
          ON x.band_idx = s.band_idx AND x.band_hash = s.band_hash
        JOIN banded y
          ON y.band_idx = x.band_idx AND y.band_hash = x.band_hash
         AND x.doc_id < y.doc_id
    )
    SELECT p.a, p.b,
           ({eq_terms}) / {NUM_HASHES}.0 AS est_jaccard
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.a
    JOIN sigs sb ON sb.doc_id = p.b
    WHERE ({eq_terms}) / {NUM_HASHES}.0 >= {THRESHOLD}
    """


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # LSH_TWIN_PASSES=n overrides the warm+min-of-2 protocol for
    # multi-minute scales (disclose single-pass rows as such)
    n_pass = int(os.environ.get("LSH_TWIN_PASSES", "3"))
    con = duckdb.connect()
    sql = pipeline_sql(sf_dir)
    times, n_rows = [], None
    for i in range(n_pass):
        t0 = time.perf_counter()
        rows = con.execute(sql).fetchall()
        times.append(time.perf_counter() - t0)
        n_rows = len(rows)
    timed = times[1:] if len(times) > 1 else times
    print(
        f"duck_lsh_twin sf_dir={sf_dir} pairs={n_rows}"
        f" min={min(timed):.3f}s passes={[round(t, 3) for t in times]}"
        f" (pass 1 = warm-up when >1)"
    )


if __name__ == "__main__":
    main()
