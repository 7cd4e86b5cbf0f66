"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of every query against the
  full corpus. Compute is O(|queries| x N) by definition; the plan
  broadcasts the (small) query set so the corpus never shuffles for
  the join, then shuffles only (query_id, vec_id, sim) triples —
  ~20 bytes/row — for the per-query top-k. This is the recall oracle.
- ivf_topk: the scale path. Corpus vectors are bucketed by nearest
  of ``n_centroids`` sampled centroids (an IVF coarse quantizer with
  sampled, training-free centroids); each query probes its
  ``n_probe`` nearest cells only, cutting compute and shuffle by
  ~n_centroids/n_probe. Recall is asserted against brute force in
  tests (tests/test_similarity.py), the honest contract of an ANN.

All math in double precision via JVM higher-order functions
(zip_with / aggregate); no Python in any row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)),"
    " cast(0 AS double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate(transform({a}, x -> cast(x AS double) * cast(x AS double)),"
    " cast(0 AS double), (acc, v) -> acc + v))"
)


def cosine_sim(a: str, b: str) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    in double precision (sequential left-to-right accumulation — the
    same order DuckDB's list functions use, so oracle hashes agree)."""
    return F.expr(
        f"({DOT.format(a=a, b=b)}) / (({NORM.format(a=a)}) * ({NORM.format(a=b)}))"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query: DataFrame[query_id, vec_id,
    sim, rank]. Deterministic tiebreak on vec_id."""
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = corpus.select(id_col, vec_col).crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine_sim(vec_col, query_vec_col), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def queries_from_corpus(
    corpus: DataFrame,
    n: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """First ``n`` corpus vectors as the query set (deterministic)."""
    return (
        corpus.where(F.col(id_col) < n)
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
    )


def sample_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Training-free coarse quantizer: the ``n_centroids`` corpus
    vectors with the smallest id-hash (a deterministic uniform sample).
    orderBy().limit() plans as TakeOrderedAndProject — per-partition
    heaps of n rows, no global sort — so this is one cheap scan even
    at corpus scale. For 100 TB one would k-means a sample instead;
    the bucketing contract downstream is identical."""
    sampled = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), 100003), F.col(id_col))
        .limit(n_centroids)
    )
    # numbering the n sampled rows: the window sorts n_centroids rows
    w = Window.orderBy(F.pmod(F.xxhash64(F.col(id_col)), 100003), F.col(id_col))
    return sampled.select(
        F.row_number().over(w).alias("cid"), F.col(vec_col).alias("centroid")
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    iters: int = 1,
) -> DataFrame:
    """Lloyd iterations in pure DataFrame ops: assign each vector to
    its nearest centroid, then recompute each centroid as the
    per-dimension mean of its members (posexplode -> groupBy(cid, dim)
    avg -> re-assemble sorted arrays). Each iteration is two shuffles
    of (cid, dim, val) triples — linear in corpus size, no driver
    materialization beyond the centroid table itself."""
    cents = centroids
    for _ in range(iters):
        assigned = _assign_cells(corpus.select(vec_col), cents, vec_col, 1)
        cents = (
            assigned.select("cid", F.posexplode(vec_col).alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("mean_val"))
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, mean_val))),"
                    " s -> cast(s.mean_val AS float))"
                ).alias("centroid")
            )
        )
    return cents


def _assign_cells(
    df: DataFrame, centroids: DataFrame, vec_col: str, n_probe: int
) -> DataFrame:
    """Attach the ``n_probe`` nearest centroid ids (by cosine) to each
    row, via broadcast of the centroid table + per-row top-n aggregate
    (min_by-style, bounded state — no window shuffle)."""
    with_c = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_csim", cosine_sim(vec_col, "centroid")
    )
    # bounded per-row state: sort the (sim, cid) pairs collected per
    # row; rows x n_centroids input collapses map-side to rows x n_probe
    key_cols = [c for c in df.columns]
    return (
        with_c.groupBy(*key_cols)
        .agg(
            F.slice(
                F.reverse(F.array_sort(F.collect_list(F.struct(F.col("_csim"), F.col("cid"))))),
                1,
                n_probe,
            ).alias("_cells")
        )
        .select(*key_cols, F.explode("_cells.cid").alias("cid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: score only vectors whose cell is among the
    query's ``n_probe`` nearest cells. DataFrame[query_id, vec_id,
    sim, rank]."""
    cents = sample_centroids(corpus, n_centroids, id_col, vec_col)
    if kmeans_iters > 0:
        cents = refine_centroids(corpus, cents, vec_col, iters=kmeans_iters)
    corpus_cells = _assign_cells(corpus.select(id_col, vec_col), cents, vec_col, 1)
    query_cells = _assign_cells(
        queries.select(query_id_col, query_vec_col), cents, query_vec_col, n_probe
    )
    candidates = corpus_cells.join(F.broadcast(query_cells), "cid").select(
        query_id_col,
        id_col,
        F.round(cosine_sim(vec_col, query_vec_col), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        candidates.dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
