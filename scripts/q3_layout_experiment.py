"""r12 (verdict task 4): measure the one untried lever from
tpch_q3_priority's SCALING.md entry — a write-once denormalized
orders|><|lineitem layout (l_orderkey, o_custkey, o_orderdate,
l_shipdate, rev_e6) that removes both SMJ exchanges on repeat runs —
against the current SMJ plan at the given fixture.

    python scripts/q3_layout_experiment.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sycl_mapreduce_cpu_gpu_hybrid_spark.session import (  # noqa: E402
    ensure_driver_memory,
    get_spark,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import (  # noqa: E402
    load_table,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/smrgh_scaled_sf10"


def t(label, fn, n=3):
    fn()  # warm
    times = []
    for _ in range(n):
        s = time.perf_counter()
        fn()
        times.append(time.perf_counter() - s)
    print(f"  {label:40s} min={min(times):7.3f}  all={[round(x,2) for x in times]}",
          flush=True)
    return min(times)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    print(f"driver heap: {ensure_driver_memory(SF)}")
    spark = get_spark(app_name="q3_experiment")
    spark.sparkContext.setLogLevel("ERROR")

    from sycl_mapreduce_cpu_gpu_hybrid_spark.queries.tpch import (
        _REV_E6,
        tpch_q3_priority,
    )

    print("A. current plan (SMJ orders/lineitem, broadcast customer):")
    t("tpch_q3_priority (current)", lambda: noop(tpch_q3_priority(spark, SF)))

    print("B. denormalized write-once layout:")
    path = os.path.join("/tmp", "q3_flat_experiment")
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_shipdate", F.expr(_REV_E6).alias("rev_e6")
    )
    flat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_custkey", "o_orderdate", "l_shipdate", "rev_e6"
    )
    s = time.perf_counter()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        flat.write.mode("overwrite").parquet(path)
    build = time.perf_counter() - s
    print(f"  layout build (once): {build:.2f}s")

    def q3_flat():
        f = spark.read.parquet(path)
        c = (
            load_table(spark, SF, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        noop(
            f.where(
                (F.col("o_orderdate") < F.lit("1998-01-01"))
                & (F.col("l_shipdate") > F.lit("1998-01-01"))
            )
            .join(c, F.col("o_custkey") == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum("rev_e6").alias("revenue_e6"))
            .orderBy(F.desc("revenue_e6"), F.asc("l_orderkey"))
            .limit(10)
            .select("l_orderkey", "o_orderdate", "revenue_e6")
        )

    t("q3 over flat layout", q3_flat)

    # sanity: same top-10
    import pandas as pd  # noqa: F401

    a = tpch_q3_priority(spark, SF).toPandas()
    f = spark.read.parquet(path)
    c = (
        load_table(spark, SF, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        f.where(
            (F.col("o_orderdate") < F.lit("1998-01-01"))
            & (F.col("l_shipdate") > F.lit("1998-01-01"))
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("rev_e6").alias("revenue_e6"))
        .orderBy(F.desc("revenue_e6"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue_e6")
        .toPandas()
    )
    same = a.reset_index(drop=True).equals(b.reset_index(drop=True))
    print(f"  results identical: {same}")
    spark.stop()


if __name__ == "__main__":
    main()
