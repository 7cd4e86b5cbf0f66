"""Same-computation DuckDB twin of the Spark SimHash near-pair
pipeline (operators/dedup.simhash + simhash_near_pairs) — the honest
ENGINE RACE companion to scripts/lsh_duck_twin.py (r13 verdict task
3): dedup_simhash_pairs' gate oracle is a sampled recall certificate,
so its ratio row compares unequal work. Here DuckDB runs the same
stages over the FULL corpus:

    normalize (lower/trim/collapse-ws) -> whitespace tokens
 -> 64-bit token hash
 -> per-doc packed bit-count sums (32 two-lane aggregates, the same
    packing trick the Spark side uses)
 -> 64-bit fingerprint: bit i set where 2*s_i > n
 -> 4x 16-bit quarter buckets (pigeonhole for hamming <= 3)
 -> bucket cap 2..200, in-bucket pairs
 -> bit_count(xor) hamming verify <= 3, distinct (a, b)

Hash family differs (DuckDB hash() vs xxhash64); the per-stage work
matches. Protocol: LSH_TWIN_PASSES env (default 3 = warm + min-of-2).

    python scripts/simhash_duck_twin.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

N_BITS = 64
HALF = 32
MAX_BUCKET = 200
MAX_HAMMING = 3


def pipeline_sql(sf_dir: str) -> str:
    packed = ",\n        ".join(
        f"sum((((h >> {i}) & 1) + (((h >> {i + HALF}) & 1) * 4294967296))"
        f"::BIGINT) AS p{i}"
        for i in range(HALF)
    )

    def lane(i: int) -> str:
        if i < HALF:
            return f"(p{i} & 4294967295)"
        return f"((p{i - HALF} // 4294967296) & 4294967295)"

    fp = " + ".join(
        f"CASE WHEN 2 * {lane(i)} > n THEN {1 << i}::UBIGINT"
        f" ELSE 0::UBIGINT END"
        for i in range(N_BITS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, hash(tok) AS h
        FROM (
            SELECT doc_id,
                   unnest(string_split(
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                       ' ')) AS tok
            FROM read_parquet('{sf_dir}/documents.parquet')
        )
        WHERE length(tok) > 0
    ),
    sums AS (
        SELECT doc_id, count(*) AS n,
        {packed}
        FROM toks GROUP BY doc_id
    ),
    fps AS (
        SELECT doc_id, ({fp}) AS fp FROM sums
    ),
    quarters AS (
        SELECT doc_id, fp, q AS q_idx,
               (fp >> (q * 16)) & 65535 AS q_val
        FROM fps, LATERAL unnest(generate_series(0, 3)) AS t(q)
    ),
    bucket_sizes AS (
        SELECT q_idx, q_val, count(*) AS sz
        FROM quarters GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND {MAX_BUCKET}
    ),
    pairs AS (
        SELECT DISTINCT least(x.doc_id, y.doc_id) AS a,
                        greatest(x.doc_id, y.doc_id) AS b,
                        bit_count(xor(x.fp, y.fp)) AS hamming
        FROM quarters x
        JOIN bucket_sizes s
          ON x.q_idx = s.q_idx AND x.q_val = s.q_val
        JOIN quarters y
          ON y.q_idx = x.q_idx AND y.q_val = x.q_val
         AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.fp, y.fp)) <= {MAX_HAMMING}
    )
    SELECT a, b, hamming FROM pairs
    """


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_pass = int(os.environ.get("LSH_TWIN_PASSES", "3"))
    con = duckdb.connect()
    sql = pipeline_sql(sf_dir)
    times, n_rows = [], None
    for _ in range(n_pass):
        t0 = time.perf_counter()
        rows = con.execute(sql).fetchall()
        times.append(time.perf_counter() - t0)
        n_rows = len(rows)
    timed = times[1:] if len(times) > 1 else times
    print(
        f"duck_simhash_twin sf_dir={sf_dir} pairs={n_rows}"
        f" min={min(timed):.3f}s passes={[round(t, 3) for t in times]}"
        f" (pass 1 = warm-up when >1)"
    )


if __name__ == "__main__":
    main()
