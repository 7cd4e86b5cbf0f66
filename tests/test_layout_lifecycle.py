"""Write-once layout lifecycle (r12 verdict task 7): a derivation-
version bump must (a) re-derive the layout under a NEW key and (b) GC
the superseded directory via prune_layout_variants — the r11
SUPP_NODE_OFFSET near-miss class, where a semantics change without a
key change would have served stale bytes under a correct-looking
fixture fingerprint. Parameterized over every fingerprint-keyed layout builder
(trade edges + nodes, ngram pair graph, orderline flat, truth pairs,
RFM segment boundaries)."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

SF = "/root/testdata/sf0.001"
ROOT = os.path.join(tempfile.gettempdir(), "smrgh_roundtrip")


def _dirs(family_glob: str) -> set[str]:
    return set(glob.glob(os.path.join(ROOT, family_glob)))


def _build_orderline(spark):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import tpch

    assert tpch._orderline_flat_layout(spark, SF) is not None


def _build_ngram(spark):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import llm

    llm._ngram_pair_graph(spark, SF).count()


def _build_truthpairs(spark):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import llm

    llm._truth_pairs_layout(spark, SF).count()


def _build_rfm_boundaries(spark):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import behavioral

    # the cut-point layout is opt-in only since r15 (the default
    # orders_rfm path derives boundaries live, on the clock)
    prior = os.environ.get("SMRGH_RFM_BOUNDARY_LAYOUT")
    os.environ["SMRGH_RFM_BOUNDARY_LAYOUT"] = "1"
    try:
        assert behavioral._rfm_boundary_literals(spark, SF, 5) is not None
    finally:
        if prior is None:
            os.environ.pop("SMRGH_RFM_BOUNDARY_LAYOUT", None)
        else:
            os.environ["SMRGH_RFM_BOUNDARY_LAYOUT"] = prior


def _build_tradegraph(spark):
    # build via the REAL consumer so the layout content matches what
    # production writes under this key: the layout is keyed by
    # (fixture fingerprints, derivation version) and trusts the
    # caller's edge frame — an earlier version of this helper wrote a
    # DIRECTED edge set under the real key and silently poisoned
    # graph_pagerank's symmetric validation in a different test file
    # (exactly the stale-layout class this test exists to catch)
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries import relational

    # the tiny fixture takes the driver-local budget tier, which
    # never touches the layout — force the distributed path (the
    # layout's only producer) for the build
    prior = os.environ.get("SMRGH_FORCE_DISTRIBUTED")
    os.environ["SMRGH_FORCE_DISTRIBUTED"] = "1"
    try:
        relational.QUERIES["graph_pagerank"](spark, SF).count()
    finally:
        if prior is None:
            os.environ.pop("SMRGH_FORCE_DISTRIBUTED", None)
        else:
            os.environ["SMRGH_FORCE_DISTRIBUTED"] = prior


CASES = [
    (
        "orderline",
        "sycl_mapreduce_cpu_gpu_hybrid_spark.queries.tpch",
        "_ORDERLINE_LAYOUT_V",
        "orderline_flat_*",
        _build_orderline,
    ),
    (
        "ngramgraph",
        "sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm",
        "_NGRAM_GRAPH_LAYOUT_V",
        "ngramgraph_pairs_*",
        _build_ngram,
    ),
    (
        "tradegraph",
        "sycl_mapreduce_cpu_gpu_hybrid_spark.queries.relational",
        "_EDGE_LAYOUT_DERIVATION_V",
        "tradegraph*_edges_*",
        _build_tradegraph,
    ),
    (
        # node layout derives FROM the edge layout through the same
        # pagerank run; its own version constant must key it
        "tradegraph-nodes",
        "sycl_mapreduce_cpu_gpu_hybrid_spark.queries.relational",
        "_NODE_LAYOUT_DERIVATION_V",
        "tradegraph*_nodes_*",
        _build_tradegraph,
    ),
    (
        "rfmboundaries",
        "sycl_mapreduce_cpu_gpu_hybrid_spark.queries.behavioral",
        "_RFM_BOUNDARY_LAYOUT_V",
        "rfmboundaries_orders_*",
        _build_rfm_boundaries,
    ),
    (
        "truthpairs",
        "sycl_mapreduce_cpu_gpu_hybrid_spark.queries.llm",
        "_TRUTH_PAIRS_LAYOUT_V",
        "truthpairs_pairs_*",
        _build_truthpairs,
    ),
]


@pytest.mark.parametrize(
    "name,mod_name,ver_attr,family_glob,build", CASES, ids=[c[0] for c in CASES]
)
def test_version_bump_rederives_and_prunes(
    spark, monkeypatch, name, mod_name, ver_attr, family_glob, build
):
    import importlib

    mod = importlib.import_module(mod_name)

    build(spark)
    before = _dirs(family_glob)
    assert before, f"{name}: no layout dir materialized under {ROOT}"

    monkeypatch.setattr(mod, ver_attr, getattr(mod, ver_attr) + 1)
    build(spark)
    bumped = _dirs(family_glob)
    assert bumped, f"{name}: bumped layout not materialized"
    assert bumped.isdisjoint(before), (
        f"{name}: version bump did not change the layout key: "
        f"{before} -> {bumped}"
    )
    # prune_layout_variants must have GC'd every superseded sibling
    assert not (before & _dirs(family_glob)), (
        f"{name}: stale pre-bump layout dir survived the re-derivation"
    )

    # restoring the version (monkeypatch teardown order: do it
    # explicitly here so we can assert) re-derives the original key
    # and GCs the bumped dir
    monkeypatch.undo()
    build(spark)
    final = _dirs(family_glob)
    assert final.isdisjoint(bumped), (
        f"{name}: stale bumped layout dir survived the restore"
    )


def test_read_layout_memoized_and_stamp_invalidated(spark, tmp_path):
    """read_layout (r14) returns the SAME lazy frame for an unchanged
    published layout (so re-declarations stay job-free and the
    declared-plan cache's purity guard can cache their consumers), and
    a REPUBLISHED layout (changed bytes/mtime) gets a fresh read —
    stale frames can never be served across a rebuild."""
    import time

    from pyspark.sql import functions as F

    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import read_layout

    path = str(tmp_path / "layout")
    spark.range(5).withColumn("v", F.col("id") * 2).write.parquet(path)
    a = read_layout(spark, path)
    b = read_layout(spark, path)
    assert a is b  # memo hit: no second read.parquet declaration
    assert a.count() == 5
    time.sleep(0.05)  # ensure a distinct mtime_ns on the rewrite
    spark.range(7).withColumn("v", F.col("id") * 3).write.mode(
        "overwrite"
    ).parquet(path)
    c = read_layout(spark, path)
    assert c is not a  # stamp change -> fresh frame
    assert c.count() == 7
    # r15 (r14 advisory): the superseded stamp must be EVICTED, not
    # accumulate for the session's lifetime, and layout keys must be
    # namespaced apart from load_table's (different frame semantics:
    # raw read vs nanosAsLong rewrite)
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources import tables

    entries = [
        k for k in tables._TABLE_CACHE[spark] if k[1] == path
    ]
    assert entries == [entries[0]]  # exactly one stamp survives
    assert entries[0][0] == "layout"
