"""Distributed k-means (Lloyd's algorithm) over an embedding column,
in EXACT fixed-point integer arithmetic.

Additive to the reference (its kernels are k-mer count reductions,
src/main.cpp:55-73); this is the clustering member of the repo's
embedding-pipeline family (operators/similarity.py already runs a
float Lloyd step inside IVF ANN — that mapInPandas matmul is the
PRODUCTION assignment path at scale; THIS module is its exactly-
oracled relational twin).

Why fixed-point: float k-means is not bit-reproducible across engines
(centroid means depend on partial-sum order), which would force the
weaker rows-only correctness check. Quantizing each component to
``floor(x * 1e6)`` (exact: float->double is exact and the product is
correctly rounded identically everywhere) makes every distance an
integer and every centroid update an integer division — Spark's
``DIV`` and DuckDB's ``//`` both truncate toward zero (verified), so
the whole iteration is deterministic to the last bit on both engines.

Scale posture (n vectors x d dims x k centroids):
- Long form (vec_id, dim, q) never materializes an n x k x d join:
  assignment joins the n·d long table to the k·d centroid table on
  the dim index with the CENTROID SIDE BROADCAST (k·d rows — tiny by
  contract), then partial-aggregates (vec, cid) sums map-side. The
  only shuffle per iteration is n·k rows of (vec_id, cid, dist) plus
  the n·d re-join for the update — the canonical O(nkd) Lloyd cost.
- Iterations are FIXED (default 2): lineage stays bounded; callers
  wanting convergence loops should localCheckpoint per round exactly
  as operators/dedup.connected_components does.
- Ties (equal distance) break toward the smallest centroid id on
  both engines via (dist, cid) ordering.
- Empty clusters DROP (standard Lloyd degenerate case): a centroid
  that attracts no members has no rows in the update aggregate and
  disappears from subsequent rounds — deterministic on both engines,
  so the oracle agrees. Production k-means re-seeds instead; the
  float production twin (operators/similarity.ivf_topk's Lloyd step)
  keeps stale centroids for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantized_long_form(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, dim, q) rows with ``q = floor(component * 1e6)`` as BIGINT.
    ``dim`` is 1-based to align with DuckDB array indexing."""
    q = F.expr(
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )
    return emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode(q).alias("pos", "q")
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "q")


def _assign(long_form: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin_c sum_d (q - c)^2 per vector; ties -> smallest cid."""
    d = (
        long_form.join(F.broadcast(centroids), "dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


def kmeans_fixedpoint(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster summary after ``iters`` Lloyd iterations seeded with the
    ``k`` smallest-id vectors: (cid, n_members, inertia, min_vec) —
    all BIGINT, bit-identical to the DuckDB oracle."""
    lf = quantized_long_form(emb, id_col, vec_col)
    cent = lf.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), "dim", F.col("q").alias("c")
    )
    assign = None
    for _ in range(iters):
        assign = _assign(lf, cent)
        cent = (
            assign.select("vec_id", "cid")
            .join(lf, "vec_id")
            .groupBy("cid", "dim")
            .agg(F.expr("sum(q) DIV count(*)").alias("c"))
        )
    final = _assign(lf, cent)
    return final.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("dist").alias("inertia"),
        F.min("vec_id").alias("min_vec"),
    )


def kmeans_fixedpoint_arrow(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`kmeans_fixedpoint` re-planned as an Arrow-batched matmul
    Lloyd step — bit-identical output (equality pytest-pinned), same
    DuckDB oracle, and no per-element join/window machinery:

    - each vector stays ONE row (quantized bigint array), never the
      n·d long form;
    - assignment is an integer numpy matmul inside mapInPandas
      (|q|² − 2 q·Cᵀ + |c|² — pure int64 arithmetic, exact; bounds:
      |q| ≤ 1e6 ⇒ q·c ≤ d·1e12, far inside int64), argmin ties break
      to the smallest cid because centroid columns are sorted by cid;
    - the per-iteration update ships only k·d partial sums per BATCH
      (cid, dim, Σq, n) through one tiny shuffle, then the truncating
      integer mean ``Σq DIV n`` — identical to the long form's;
    - centroids are COLLECTED between iterations (k·d values — the
      driver-coordinated loop every production Lloyd runs, cf. MLlib),
      so the k·d matrix broadcasts into the next pass's closure.

    The relational long form stays as the oracle-shaped twin; this is
    the production path (the same split as IVF ANN's float Lloyd)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    q = F.expr(
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )
    emb_q = emb.select(F.col(id_col).alias("vec_id"), q.alias("qvec")).persist()

    seed_rows = sorted(
        emb_q.where(F.col("vec_id") < k).collect(), key=lambda r: r["vec_id"]
    )
    cids = [int(r["vec_id"]) for r in seed_rows]
    C = np.array([r["qvec"] for r in seed_rows], dtype=np.int64)

    def partials(cids: list[int], C: np.ndarray):
        cn = (C * C).sum(axis=1)

        def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.array(list(pdf["qvec"]), dtype=np.int64)
                d2 = (V * V).sum(axis=1)[:, None] - 2 * (V @ C.T) + cn[None, :]
                a = d2.argmin(axis=1)  # first min — smallest cid wins ties
                out = []
                for j, cid in enumerate(cids):
                    m = a == j
                    if not m.any():
                        continue
                    s = V[m].sum(axis=0)
                    out.append(
                        pd.DataFrame(
                            {
                                "cid": cid,
                                "dim": np.arange(1, V.shape[1] + 1),
                                "s": s,
                                "n": int(m.sum()),
                            }
                        )
                    )
                if out:
                    yield pd.concat(out)

        return f

    for _ in range(iters):
        newc = (
            emb_q.mapInPandas(partials(cids, C), schema="cid int, dim int, s long, n long")
            .groupBy("cid", "dim")
            .agg(F.expr("sum(s) DIV sum(n)").alias("c"))
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, c))),"
                    " x -> x.c)"
                ).alias("cvec")
            )
            .collect()
        )
        newc = sorted(newc, key=lambda r: r["cid"])
        cids = [int(r["cid"]) for r in newc]
        C = np.array([r["cvec"] for r in newc], dtype=np.int64)

    cn = (C * C).sum(axis=1)
    fin_cids = np.array(cids, dtype=np.int64)

    def final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["qvec"]), dtype=np.int64)
            ids = pdf["vec_id"].to_numpy()
            d2 = (V * V).sum(axis=1)[:, None] - 2 * (V @ C.T) + cn[None, :]
            a = d2.argmin(axis=1)
            dist = d2[np.arange(len(a)), a]
            yield pd.DataFrame(
                {
                    "cid": fin_cids[a],
                    "n_partial": 1,
                    "dist": dist,
                    "vec_id": ids,
                }
            )

    return (
        emb_q.mapInPandas(
            final, schema="cid long, n_partial long, dist long, vec_id long"
        )
        .groupBy("cid")
        .agg(
            F.sum("n_partial").cast("bigint").alias("n_members"),
            F.sum("dist").cast("bigint").alias("inertia"),
            F.min("vec_id").alias("min_vec"),
        )
    )


def kmeans_oracle_sql(k: int = 4, iters: int = 2) -> str:
    """DuckDB replay of :func:`kmeans_fixedpoint` — identical
    quantization, seeding, tie-break, and truncating integer mean."""
    steps = [
        f"""lf AS (
            SELECT vec_id, t.dim AS dim,
                   CAST(floor(CAST(embedding[t.dim] AS DOUBLE) * {SCALE}) AS BIGINT) AS q
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(dim)
        )""",
        f"c0 AS (SELECT vec_id AS cid, dim, q AS c FROM lf WHERE vec_id < {k})",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        steps.append(
            f"""d{it} AS (
                SELECT lf.vec_id, {prev}.cid,
                       sum((lf.q - {prev}.c) * (lf.q - {prev}.c)) AS dist
                FROM lf JOIN {prev} ON lf.dim = {prev}.dim
                GROUP BY 1, 2
            ), a{it} AS (
                SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM d{it}
            ), c{it} AS (
                SELECT a{it}.cid, lf.dim, sum(lf.q) // count(*) AS c
                FROM a{it} JOIN lf USING (vec_id)
                WHERE a{it}.rn = 1
                GROUP BY 1, 2
            )"""
        )
        prev = f"c{it}"
    fin = iters + 1
    steps.append(
        f"""d{fin} AS (
            SELECT lf.vec_id, {prev}.cid,
                   sum((lf.q - {prev}.c) * (lf.q - {prev}.c)) AS dist
            FROM lf JOIN {prev} ON lf.dim = {prev}.dim
            GROUP BY 1, 2
        ), a{fin} AS (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM d{fin}
        )"""
    )
    return f"""
        WITH {", ".join(steps)}
        SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(dist) AS BIGINT) AS inertia,
               min(vec_id) AS min_vec
        FROM a{fin} WHERE rn = 1
        GROUP BY cid
    """
