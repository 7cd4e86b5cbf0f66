"""Round-11 guard tests: the symmetric-graph debug probe, the
directory-walking driver-memory sizing, its host-RAM clamp, and the
exact-quantile library hooks (unpersist registry + many_groups)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_pagerank_symmetric_probe_raises_on_directed(spark, monkeypatch):
    """symmetric=True with SMRGH_VERIFY_SYMMETRIC set must RAISE on a
    directed edge set (dst-only nodes) instead of silently dropping
    them, and still pass on a genuinely symmetric set."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    monkeypatch.setenv("SMRGH_VERIFY_SYMMETRIC", "1")
    directed = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    with pytest.raises(Exception, match="directed"):
        # local_max_edges=0 forces the distributed path where the
        # symmetric fast degree-build (and its probe) lives
        pagerank_fixedpoint(
            directed, iters=1, local_max_edges=0, symmetric=True
        ).collect()

    sym = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    ok = pagerank_fixedpoint(
        sym, iters=1, local_max_edges=0, symmetric=True
    )
    assert ok.count() == 3


def test_ensure_driver_memory_walks_directories(tmp_path, monkeypatch):
    """A fixture laid out as Spark-written parquet DIRECTORIES must
    size identically to the same bytes as flat files (ADVICE r10: the
    listdir form totaled 0 and fell back to 16g)."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.session import (
        ensure_driver_memory,
    )

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "t.parquet").write_bytes(b"x" * (1 << 20))
    nested = tmp_path / "nested"
    (nested / "t.parquet").mkdir(parents=True)
    (nested / "t.parquet" / "part-0.parquet").write_bytes(b"x" * (1 << 20))
    got_flat = ensure_driver_memory(str(flat))
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    got_nested = ensure_driver_memory(str(nested))
    assert got_flat == got_nested


def test_ensure_driver_memory_clamps_to_host_ram(tmp_path, monkeypatch):
    """The 26x slope must not demand a heap the host cannot give: a
    fixture sized to imply > host RAM clamps to ~80% of it (ADVICE
    r10: a 10GB fixture demanded 264g and the JVM failed to launch)."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark import session as sess

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    fx = tmp_path / "big"
    fx.mkdir()
    (fx / "t.parquet").write_bytes(b"")
    real_getsize = os.path.getsize
    monkeypatch.setattr(
        sess.os.path,
        "getsize",
        lambda p: 20 * (1 << 30) if p.endswith("t.parquet") else real_getsize(p),
    )
    heap = sess.ensure_driver_memory(str(fx))
    need = int(heap.rstrip("g"))
    host_gib = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) / (
        1 << 30
    )
    assert need <= host_gib * 0.8 + 8  # clamped, not 20*26=520g


def test_exact_quantiles_hooks_value_identical(spark):
    """many_groups=True (no broadcast hints) and the unpersist
    registry must not change values; the registry receives exactly the
    persisted counts relation."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.relational import (
        _exact_group_quantiles,
    )

    df = spark.createDataFrame(
        [(g, float(v)) for g in ("a", "b") for v in range(17)],
        "k string, x double",
    )
    specs = [("x", 0.5, "med"), ("x", 0.9, "p90")]
    base = sorted(
        map(tuple, _exact_group_quantiles(df, "k", specs).collect())
    )
    reg: list = []
    alt = sorted(
        map(
            tuple,
            _exact_group_quantiles(
                df, "k", specs, unpersist_registry=reg, many_groups=True
            ).collect(),
        )
    )
    assert base == alt
    assert len(reg) == 1
    reg[0].unpersist()


def test_tradegraph_layout_key_tracks_both_sources(tmp_path, monkeypatch):
    """The edge-layout key must change when EITHER source table's
    fingerprint changes (a stale layout must never be served against a
    regenerated fixture), and must stay stable when nothing changed."""
    import shutil

    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import (
        fingerprint_cache_dir,
    )

    src = "/root/testdata/sf0.001"
    fx = tmp_path / "fx"
    fx.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(f"{src}/{t}.parquet", fx / f"{t}.parquet")

    def key(d):
        import hashlib

        ka = fingerprint_cache_dir(str(d), "tg", "orders")
        kb = fingerprint_cache_dir(str(d), "tg", "lineitem")
        return hashlib.sha256(f"{ka}|{kb}".encode()).hexdigest()[:16]

    k0 = key(fx)
    assert key(fx) == k0  # stable when untouched
    os.utime(fx / "orders.parquet")  # orders regenerated (mtime bump)
    k1 = key(fx)
    assert k1 != k0
    os.utime(fx / "lineitem.parquet")
    assert key(fx) not in (k0, k1)
