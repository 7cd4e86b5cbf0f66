"""Ad-hoc per-query profiler: warm each named query, then time N runs
and report min/median, the declaration-vs-execution split, and the
number of Spark JOBS the timed run launched (job-group counted via the
status tracker) — extra jobs beyond the noop write are eager actions
(counts, localCheckpoints, probe collects) that each pay the
scheduling floor.

    python scripts/profile_queries.py [--plan] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from sycl_mapreduce_cpu_gpu_hybrid_spark.session import (  # noqa: E402
    ensure_driver_memory,
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_plan = "--plan" in sys.argv
    print(f"driver heap: {ensure_driver_memory(SF_DIR)}")
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args or list(qs)
    for name in names:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        times, decls, jobs = [], [], 0
        for i in range(3):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            d = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            decls.append(t1 - t0)
            sc.setJobGroup("prof_idle", "idle")
            jobs = max(jobs, len(sc.statusTracker().getJobIdsForGroup(group)))
        print(
            f"{name:32s} min={min(times):7.3f}  med={statistics.median(times):7.3f}"
            f"  decl={min(decls):6.3f}  jobs={jobs}",
            flush=True,
        )
        if show_plan:
            df.explain("formatted")


if __name__ == "__main__":
    main()
