"""Derive a larger-SF fixture from an existing one by FK-preserving
replication — the sf1 the r6 verdict asked the full parity gate to run
at (task 8) does not ship in /root/testdata, so we synthesize it:
every table is replicated ``--factor`` times with each replica's keys
offset by that key's domain size, exactly how TPC-H scale grows (more
customers/orders/docs, not bigger ones). Referential integrity is
preserved across tables:

- customer.c_custkey, orders.o_custkey, events.user_id share the
  customer offset (events.user_id joins c_custkey in
  events_user_enrich-style queries);
- orders.o_orderkey / lineitem.l_orderkey share the order offset;
- lineitem.l_partkey / part.p_partkey and l_suppkey / s_suppkey
  share the part / supplier offsets;
- documents.doc_id and embeddings.vec_id use their own offsets;
- region / nation (dimension constants, 5/25 rows) are copied as-is,
  so nationkey references stay valid.

Written with DuckDB as ONE parquet file per table — the layout
tests/parity.py's read_parquet() registration expects. Timestamps are
rewritten in DuckDB's default physical unit (us); both gate engines
read the SAME file, so the comparison stays engine-vs-engine exact.

    python scripts/make_scaled_fixture.py [--src /root/testdata/sf0.1]
        [--factor 10] [--out /tmp/smrgh_scaled_sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> {column: offset_domain_table} ; offsets are the row-domain
# size of the referenced table, read from the source fixture itself
KEY_MAP: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# key-domain size per table = max(key)+1 of its primary key
DOMAIN_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _text_perturb(factor: int) -> str:
    """Per-replica Caesar rotation of latin letters in documents.text:
    verbatim clones would give every doc ``factor - 1`` exact
    duplicates, multiplying per-shingle doc-frequency by ``factor``
    and blowing up anything that expands near-universal shingle
    buckets (the first sf1 attempt OOMed a 64g heap in the dedup
    truth expansion). Rotation keeps length, charset class, and word
    structure — each replica block reproduces the ORIGINAL fixture's
    internal near-dup pair structure with disjoint latin shingle
    spaces. Non-latin scripts (the zh slice) pass through untouched
    and stay cloned across replicas; their per-shingle df grows by at
    most ``factor``, bounded by the dedup operators' df caps and the
    certificates' absolute truth-sample budget."""
    cases = " ".join(
        f"WHEN r.i = {i} THEN translate(text,"
        f" '{_LOWER + _UPPER}',"
        f" '{_LOWER[i:] + _LOWER[:i] + _UPPER[i:] + _UPPER[:i]}')"
        for i in range(1, factor)
    )
    return f"CASE WHEN r.i = 0 THEN text {cases} END AS text"


def _embedding_perturb() -> str:
    """Per-replica CIRCULAR ROTATION of the embedding array: verbatim
    clones give every vector ``factor - 1`` exact duplicates (max
    cosine 1.0 to 9 others), degenerating LSH buckets and ANN truth
    exactly like cloned texts degenerate shingle buckets. Rotating by
    ``r.i`` positions keeps the value multiset and the L2 norm (norm
    profiles per label stay identical) while decorrelating directions,
    so each replica block reproduces the ORIGINAL similarity
    structure. Pure list slicing — generator-only SQL, not an oracle,
    so the version-stability rule doesn't apply."""
    return (
        "CASE WHEN r.i = 0 THEN embedding ELSE"
        " list_concat(embedding[r.i + 1:], embedding[:r.i])"
        " END AS embedding"
    )


def make(src: str, out: str, factor: int) -> None:
    if not 1 <= factor <= 26:
        raise ValueError("factor must be in [1, 26] (Caesar rotation alphabet)")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    domains = {
        t: con.sql(
            f"SELECT max({k}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        for t, k in DOMAIN_KEY.items()
    }
    for table, remaps in KEY_MAP.items():
        src_path = f"{src}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        cols = con.sql(f"SELECT * FROM read_parquet('{src_path}') LIMIT 0").columns
        if not remaps:  # dimension constants: straight copy
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_path}')) TO '{dst}'"
                " (FORMAT PARQUET)"
            )
            continue
        def col_expr(c: str) -> str:
            if c in remaps:
                return f"{c} + r.i * {domains[remaps[c]]} AS {c}"
            if table == "documents" and c == "text":
                return _text_perturb(factor)
            if table == "embeddings" and c == "embedding":
                return _embedding_perturb()
            return c

        exprs = ", ".join(col_expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {exprs}"
            f" FROM read_parquet('{src_path}'), range(0, {factor}) AS r(i)"
            f" ORDER BY r.i) TO '{dst}' (FORMAT PARQUET)"
        )
    for table in KEY_MAP:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table:11s} {n:>9} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/smrgh_scaled_sf1")
    a = ap.parse_args()
    make(a.src, a.out, a.factor)
