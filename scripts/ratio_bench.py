"""Spark-vs-DuckDB ratio on the oracled query subset — the judge's
perf-gate protocol: per query, 1 warm-up + min-of-2 timed runs; Spark
materializes via noop sink, DuckDB via fetchall of the oracle SQL.

    python scripts/ratio_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from sycl_mapreduce_cpu_gpu_hybrid_spark.session import (  # noqa: E402
    ensure_driver_memory,
    get_spark,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import TABLE_NAMES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])  # optional query-name subset
    print(f"driver heap: {ensure_driver_memory(sf_dir)}")
    spark = get_spark(app_name="ratio")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows = []
    for name, fn in qs.items():
        if name not in oracles or (only and name not in only):
            continue
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            st = min(
                _t(lambda: fn(spark, sf_dir).write.format("noop").mode("overwrite").save())
                for _ in range(2)
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK ERR {exc}")
            continue
        finally:
            # Between QUERIES (never between a query's timed runs):
            # 1) clearCache() UNREGISTERS the SQL relation cache —
            #    order matters: unpersisting a cached relation's RDD
            #    while its CacheManager entry stays registered leaves
            #    a poisoned entry with no storage, and any LATER query
            #    whose plan canonicalizes onto it recomputes the
            #    lineage per consumer (measured: dedup_ngram_jaccard
            #    5.8 -> 88.7s in the sweep when the raw unpersist ran
            #    without the clearCache);
            # 2) the remaining persistent RDDs are the iterative
            #    loops' localCheckpoint blocks (not in the SQL cache),
            #    which otherwise accumulate until a later broadcast
            #    build fails at the derived sf1 — see tests/parity.py.
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
        sql = oracles[name]
        con.execute(sql).fetchall()
        dt = min(_t(lambda: con.execute(sql).fetchall()) for _ in range(2))
        rows.append((st / max(dt, 1e-9), name, st, dt))
    rows.sort(reverse=True)
    tot_s = sum(r[2] for r in rows)
    tot_d = sum(r[3] for r in rows)
    for ratio, name, st, dt in rows:
        print(f"{name:30s} spark={st:7.3f} duck={dt:7.3f} x{ratio:8.1f}")
    print(
        f"\nORACLED SET: spark={tot_s:.2f}s duck={tot_d:.2f}s "
        f"ratio={tot_s / tot_d:.2f}x over {len(rows)} queries"
    )
    # Floor decomposition (r10 verdict task 2): queries whose DuckDB
    # time is under 50ms measure Spark's fixed session/stage floor
    # (noop ~15ms, smallest shuffle ~95ms on this host), not plan
    # quality — split them out so the ratio conversation is about the
    # queries where the denominator is real work.
    floor = [r for r in rows if r[3] < 0.050]
    rest = [r for r in rows if r[3] >= 0.050]
    for label, part in (("FLOOR-BOUND (duck<50ms)", floor), ("NON-FLOOR", rest)):
        if not part:
            continue
        ps = sum(r[2] for r in part)
        pd = sum(r[3] for r in part)
        print(
            f"{label}: spark={ps:.2f}s duck={pd:.2f}s "
            f"ratio={ps / max(pd, 1e-9):.2f}x over {len(part)} queries"
        )


def _t(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
