"""Benchmark harness — reproduces the reference's measurement protocol
(runprogram.sh:16-101: per-point warm-up runs excluded from metrics,
one appended points.txt row per measurement) over this engine's
declared query inventory.

Default mode (driver contract): run every query in
``__spark_entry__.queries()`` against ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, one warm-up +
one timed run each, and print ONE JSON line::

    {"metric": "bench_total_wall", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each timed run fully materializes via the ``noop`` sink (all
partitions computed, nothing collected) — the closest analog of the
reference's kernel-time bracket (src/helper.h:124-196) without
driver-transfer bias. Timings also append to ``points.txt`` in the
reference's row shape ``N k ls lsc mode metric value``
(src/main.cpp:19-38) via plans.metrics.MetricsRecorder.

Sweep mode (``SPARK_GRAFT_SWEEP=1``): additionally runs the
reference's own experiment grid — k-mer counting over k x truncation-N
(README.md:3-10 shape) — appending one points row per grid point.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sycl_mapreduce_cpu_gpu_hybrid_spark.plans.metrics import (  # noqa: E402
    METRIC_CPU_TEMP_C,
    METRIC_CPU_UTIL_PCT,
    METRIC_EXEC_PEAK_MEM_MB,
    METRIC_HOST_MEM_MB,
    METRIC_SHUFFLE_READ_MB,
    METRIC_SHUFFLE_WRITE_MB,
    METRIC_TIME_MS,
    CpuMonitor,
    MetricsRecorder,
    StageMetricsCapture,
    timed,
)

POINTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "points.txt")
RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
SWEEP_KS = [2, 4, 8, 16]
SWEEP_NS = [100, 200, 400]
# reference-MAGNITUDE grid (README.md:3-10: N up to 5,000,000
# chars/file; truncator.sh:14-20 / runprogram.sh k up to 64): the r5
# verdict flagged the toy grid above as shape-only, so SWEEP=1 now
# also runs the real magnitudes over MAG_DOCS documents expanded by
# text repetition (fixture docs are short; repetition keeps the
# distinct-k-mer space bounded while the explode volume scales to
# N x MAG_DOCS = 120M k-mers at the top point — the throughput shape
# that matters at cluster scale)
MAG_NS = [5_000, 50_000, 500_000, 5_000_000]
MAG_KS = [2, 8, 64]
MAG_DOCS = 24
# fixed DuckDB reference timings recorded with every bench artifact:
# the host showed a whole-machine ~1.5x drift between r3 and r5, so
# round-over-round Spark comparisons self-normalize against the same
# single-threaded floor measured in the same session
DUCK_FLOOR_SQL = {
    "scan_agg": (
        "SELECT l_returnflag, count(*) AS n, sum(l_extendedprice) AS s"
        " FROM lineitem GROUP BY 1 ORDER BY 1"
    ),
    "join_agg": (
        "SELECT c_mktsegment, count(*) AS n FROM orders"
        " JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"
    ),
    "string_scan": "SELECT count(*) AS n, sum(length(text)) AS chars FROM documents",
}


def spark_floor(spark) -> dict[str, float]:
    """Measured per-query overhead floor, published with every bench
    artifact so the ratio decomposition is self-documenting: the time
    to noop-write (a) a 1-row in-memory frame (pure job scheduling +
    py4j round trip — no data, no shuffle) and (b) a 1-row parquet
    scan + 32-partition shuffle (the smallest realistic query shape).
    Any declared query's wall time is bounded below by (a); ~70 of the
    125 queries cost DuckDB <50 ms and sit within a few multiples of
    (b) — harness-floor territory, not plan defects."""
    from pyspark.sql import functions as F

    floors: dict[str, float] = {}
    one = spark.range(1)
    force(one)
    best = float("inf")
    for _ in range(3):
        with timed() as t:
            force(one)
        best = min(best, t["sec"])
    floors["noop_1row"] = round(best, 4)
    shuffled = spark.range(32).groupBy((F.col("id") % 4).alias("k")).count()
    force(shuffled)
    best = float("inf")
    for _ in range(3):
        with timed() as t:
            force(shuffled)
        best = min(best, t["sec"])
    floors["shuffle_32part"] = round(best, 4)
    return floors


def duck_floor(sf_dir: str) -> dict[str, float]:
    """Min-of-2 warm DuckDB timings for three fixed queries on the
    same parquet — the drift anchor for BENCH_r{N} comparisons."""
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    floors: dict[str, float] = {}
    for name, sql in DUCK_FLOOR_SQL.items():
        con.execute(sql).fetchall()  # warm-up
        best = float("inf")
        for _ in range(2):
            with timed() as t:
                con.execute(sql).fetchall()
            best = min(best, t["sec"])
        floors[name] = round(best, 4)
    floors["total"] = round(sum(floors.values()), 4)
    return floors
# local-size permutation sweep, mirroring runprogram.sh:119-129's
# work-group sizes 1..512 at fixed N; the Spark local-size knob is
# spark.sql.shuffle.partitions
SWEEP_LS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _kmer_k(name: str) -> int:
    m = re.search(r"_k(\d+)", name)
    return int(m.group(1)) if m else 0


def run_inventory(
    spark,
    sf_dir: str,
    recorder: MetricsRecorder,
    n_scale: int,
    ls: int,
    errors: dict[str, str] | None = None,
    queries: dict | None = None,
    record_points: bool = True,
) -> dict[str, float]:
    if queries is None:
        import __spark_entry__ as entrymod

        queries = entrymod.queries()
    # SPARK_GRAFT_QUERIES=a,b,c restricts the inventory (iteration +
    # external-measurement smoke runs)
    if subset := os.environ.get("SPARK_GRAFT_QUERIES"):
        names = {s.strip() for s in subset.split(",")}
        queries = {k: v for k, v in queries.items() if k in names}
    if errors is None:
        errors = {}

    cpu = CpuMonitor()
    capture = StageMetricsCapture(spark)
    timings: dict[str, float] = {}
    # SPARK_GRAFT_MARKERS=1: emit the reference's START/STOP marker
    # protocol (measyrepy.py:227-246) around each timed run so the
    # external harness (scripts/measure.py) can bracket phases from
    # outside the process
    markers = os.environ.get("SPARK_GRAFT_MARKERS") == "1"
    for name, fn in queries.items():
        # Extra passes skip names that already errored in pass 1: a
        # late success would otherwise enter the headline from a single
        # UNWARMED run while still listed in errors (r13 advisory) —
        # the error ledger and the headline must describe the same set.
        if not record_points and name in errors:
            continue
        # Per-query fault isolation (round-5 fix): one broken query
        # must never zero the whole bench artifact — record the error
        # and keep timing the rest.
        try:
            if record_points:
                # per-point warm-up, excluded from metrics
                # (runprogram.sh:29-41)
                force(fn(spark, sf_dir))
            # min of two timed runs: the host shows episodic CPU-steal
            # bursts; min is the standard noise-robust point estimate.
            # Secondary metrics bracket only the LAST run (one clean
            # START..STOP window, reference Metric() protocol).
            # Extra min-of-N passes (record_points=False) time once —
            # pass 1 already warmed JIT/codegen; the caller takes the
            # min across passes.
            best = float("inf")
            for i in range(2 if record_points else 1):
                if record_points and i == 1:
                    stages_before = capture.stages()
                    cpu.snapshot_start()
                if markers:
                    print(f"START {name}", flush=True)
                with timed() as t:
                    force(fn(spark, sf_dir))
                if markers:
                    print(f"STOP {name}", flush=True)
                best = min(best, t["sec"])
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            msg = f"{type(exc).__name__}: {exc}"[:500]
            if record_points:
                errors[name] = msg
            else:
                # a name green in pass 1 that fails a later pass keeps
                # its pass-1 timing in the headline; disclose the flake
                # under a distinct key instead of overwriting the
                # per-query ledger (r13 advisory)
                errors.setdefault(f"{name} (extra-pass flake)", msg)
            spark.catalog.clearCache()
            continue
        timings[name] = round(best, 4)
        # operators persist intra-query shared stages (dedup.py) and
        # each of the 3 runs above registers fresh entries; centralized
        # cleanup keeps a 65-query x 3-run session from accumulating
        # cache blocks for its whole lifetime. The explicit BLOCKING
        # unpersist also drops the iterative loops' localCheckpoint
        # RDDs (not in the SQL cache); async unpersist measured ~2GB
        # of dead blocks still resident when the next query started
        # at the 10x fixture.
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        if not record_points:
            continue

        def rec(metric: int, value: float) -> None:
            recorder.record(
                n=n_scale, k=_kmer_k(name), ls=ls, lsc=ls, mode="spark-local",
                metric=metric, value=value,
            )

        # points.txt records pass-1's min-of-2; the JSON headline is
        # the tighter union-min across all bench_passes, so the two
        # artifacts may disagree per query (JSON <= points.txt). The
        # JSON carries the authoritative statistic; points.txt keeps
        # the reference Metric() protocol's one-clean-window shape.
        rec(METRIC_TIME_MS, round(best * 1000, 3))
        rec(METRIC_CPU_UTIL_PCT, round(cpu.util_since_snapshot(), 2))
        rec(METRIC_HOST_MEM_MB, cpu.mem_used_mb())
        if (temp := cpu.temp_c()):
            rec(METRIC_CPU_TEMP_C, temp)
        if capture.enabled:
            d = capture.delta(stages_before, capture.stages())
            rec(METRIC_EXEC_PEAK_MEM_MB, round(d["peak_exec_mem_mb"], 3))
            rec(METRIC_SHUFFLE_WRITE_MB, round(d["shuffle_write_mb"], 3))
            rec(METRIC_SHUFFLE_READ_MB, round(d["shuffle_read_mb"], 3))
    return timings


def run_sweep(spark, sf_dir: str, recorder: MetricsRecorder, ls: int) -> None:
    """The reference's own grid: k x N (chars/doc truncation —
    truncator.sh semantics) over the documents corpus."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.kmer import kmer_count
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.corpus import truncate_docs
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    for k in SWEEP_KS:
        for n in SWEEP_NS:
            q = kmer_count(truncate_docs(docs, n), k=k, min_count=2)
            force(q)  # warm-up (JIT/codegen), suppressed like warmup=1
            recorder.record(
                n=n, k=k, ls=ls, lsc=ls, mode="spark-local",
                metric=METRIC_TIME_MS, value=0.0, warmup=True,
            )
            with timed() as t:
                force(q)
            recorder.record(
                n=n, k=k, ls=ls, lsc=ls, mode="spark-local",
                metric=METRIC_TIME_MS, value=round(t["sec"] * 1000, 3),
            )


def run_sweep_magnitude(spark, sf_dir: str, recorder: MetricsRecorder, ls: int) -> None:
    """The reference grid at its REAL magnitudes (N to 5M chars/doc,
    k to 64) over MAG_DOCS docs whose text is tiled by repetition to
    exactly N chars. The expanded corpus is MATERIALIZED once per N
    (localCheckpoint — executor-side rows, the driver never holds a
    5 MB string): leaving the repeat() in the lazy plan would
    re-evaluate the O(N) expansion under every downstream projection.
    ``spread=True`` is forced because Catalyst's size stats don't
    model the 1000x row expansion (the auto decision would see the
    tiny parquet scan and run single-task). The top grid point pushes
    ~120M exploded k-mers through the byte-windowed map kernel and
    the group-count reduce."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.kmer import kmer_count
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(f"doc_id < {MAG_DOCS}")
    for n in MAG_NS:
        expanded = docs.selectExpr(
            "doc_id",
            f"substring(repeat(text, int(ceil({n} / greatest(length(text), 1)))),"
            f" 1, {n}) AS text",
        ).localCheckpoint()
        for k in MAG_KS:
            q = kmer_count(expanded, k=k, min_count=2, spread=True)
            force(q)  # warm-up, suppressed (runprogram.sh:29-41)
            with timed() as t:
                force(q)
            recorder.record(
                n=n, k=k, ls=ls, lsc=ls, mode="spark-local",
                metric=METRIC_TIME_MS, value=round(t["sec"] * 1000, 3),
            )


def run_ls_sweep(spark, sf_dir: str, recorder: MetricsRecorder) -> None:
    """The reference's local-size permutation sweep (runprogram.sh:
    119-129): work-group sizes 1..512 at fixed N. The Spark local-size
    knob is ``spark.sql.shuffle.partitions``; AQE coalescing is
    suspended for the sweep so the requested partition count is the
    one actually executed, then restored."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.kmer import kmer_count
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.corpus import truncate_docs
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table

    prior_ls = spark.conf.get("spark.sql.shuffle.partitions")
    prior_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        docs = load_table(spark, sf_dir, "documents")
        n_fixed = 400
        for ls in SWEEP_LS:
            spark.conf.set("spark.sql.shuffle.partitions", str(ls))
            q = kmer_count(truncate_docs(docs, n_fixed), k=8, min_count=2)
            force(q)  # warm-up, suppressed (runprogram.sh:29-41)
            with timed() as t:
                force(q)
            recorder.record(
                n=n_fixed, k=8, ls=ls, lsc=ls, mode="spark-local",
                metric=METRIC_TIME_MS, value=round(t["sec"] * 1000, 3),
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior_ls)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prior_coalesce)


def write_attempt(
    logfile: str,
    n: int,
    k: int,
    ls: int,
    bs: int,
    dev: str,
    status: int,
) -> int:
    """Run-attempt bookkeeping in the reference's attempts.log format
    (scripts/old/attemptwriter.sh:17-39): one parameter header line
    per attempt — attempt number derived by counting existing headers,
    exactly like the shell script's grep -c — followed by
    Success / Fail -syserror (signal S) for status >= 128 /
    Fail -missing, and a separator. Returns the attempt number."""
    os.makedirs(os.path.dirname(logfile), exist_ok=True)
    attempt = 1
    if os.path.exists(logfile):
        with open(logfile) as fh:
            attempt += sum(
                1
                for line in fh
                if re.match(r"^Attempt [0-9]+: N=", line)
            )
    with open(logfile, "a") as fh:
        fh.write(f"Attempt {attempt}: N={n}, K={k}, LS={ls}, BS={bs}, DEV={dev}\n")
        if status == 0:
            fh.write(f"Attempt {attempt}: Success\n")
        elif status >= 128:
            fh.write(f"Attempt {attempt}: Fail -syserror (signal {status - 128})\n")
        else:
            fh.write(f"Attempt {attempt}: Fail -missing\n")
        fh.write("--------------------------------\n")
    return attempt


def compact_summary(out: dict, full_path: str, budget: int = 1500) -> dict:
    """Bound the one-line stdout summary to ``budget`` serialized
    bytes: keep headline fields intact, trim the per-query map to the
    slowest entries (10 at a time) until the line fits. The full map
    lives at ``full_path``."""
    timings = out["queries"]
    compact = dict(out)
    compact["n_queries"] = len(timings)
    compact["queries_full"] = full_path
    if out.get("errors"):
        compact["errors"] = {
            k: v[:80] for k, v in list(out["errors"].items())[:5]
        }
    slowest = sorted(timings, key=timings.get, reverse=True)
    while len(json.dumps(compact)) > budget and compact["queries"]:
        slowest = slowest[: max(len(compact["queries"]) - 10, 0)]
        compact["queries"] = {k: timings[k] for k in slowest}
        compact["queries_shown"] = f"slowest {len(slowest)} of {len(timings)}"
    return compact


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from sycl_mapreduce_cpu_gpu_hybrid_spark.session import (
        ensure_driver_memory,
        get_spark,
    )

    # Scale the single-JVM heap to the fixture before launch (sf10's
    # 64 GiB requirement as code, not folklore — r9 verdict task 7)
    print(f"driver heap: {ensure_driver_memory(sf_dir)}", file=sys.stderr)
    # UI on for the bench session only: the REST status API is how
    # StageMetricsCapture reads per-stage shuffle/memory metrics
    spark = get_spark(app_name="bench", extra_conf={"spark.ui.enabled": "true"})
    ls = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_scale = int((sf or 0) * 1_000_000)

    recorder = MetricsRecorder()
    errors: dict[str, str] = {}
    timings = run_inventory(spark, sf_dir, recorder, n_scale, ls, errors)
    # Min-of-N passes (r12 verdict task 4): a single-pass total on this
    # shared host reads up to 24% over the quiet-window floor (BENCH_r12
    # 63.98 s vs 3 quiet passes at ~47 s on identical code — ambient
    # tenant load, see SCALING.md "Ambient-load variance"). Pass 1 above
    # keeps the reference measurement protocol (warm-up + min-of-2 +
    # secondary-metric bracket + points.txt rows); passes 2..N re-time
    # each query once — declarations come from the prepared-plan cache,
    # caches are cleared per query, so every extra pass is a full
    # uncached execution. The artifact carries per-pass totals and the
    # headline becomes the per-query min across passes: the statistic
    # the quiet-window files carried manually in r11/r12.
    n_passes = max(int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")), 1)
    pass_totals = [round(sum(timings.values()), 4)]
    for _ in range(n_passes - 1):
        extra = run_inventory(
            spark, sf_dir, recorder, n_scale, ls, errors,
            record_points=False,
        )
        pass_totals.append(round(sum(extra.values()), 4))
        for name, sec in extra.items():
            timings[name] = min(timings.get(name, float("inf")), sec)
    if os.environ.get("SPARK_GRAFT_SWEEP") == "1":
        run_sweep(spark, sf_dir, recorder, ls)
        run_sweep_magnitude(spark, sf_dir, recorder, ls)
        run_ls_sweep(spark, sf_dir, recorder)
    recorder.write_points(POINTS_PATH)

    out = {
        "metric": "bench_total_wall",
        # headline = sum of per-query min across passes (the quiet-
        # window floor statistic); pass_totals carries each raw pass
        # so a genuine regression still surfaces as a shifted floor.
        # "semantics" discloses this in the artifact itself so
        # consumers don't compare the union-min floor 1:1 against
        # pre-r13 single-pass headlines (r13 advisory).
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "semantics": (
            "union-min floor: per-query min across bench_passes; no "
            "single pass achieved this total (see pass_totals)"
        ),
        "bench_passes": n_passes,
        "pass_totals": pass_totals,
        "queries": timings,
        "sf": sf,
        "duck_floor": duck_floor(sf_dir),
        "spark_floor": spark_floor(spark),
    }
    if errors:
        out["errors"] = errors

    # The driver captures a bounded TAIL of stdout and parses the
    # JSON it finds there. r6's single line grew past that buffer as
    # the inventory passed ~100 queries, so the tail began mid-object
    # and BENCH_r06.json recorded parsed: null. Emit the full record
    # to results/ for humans, then print a compact line LAST — per-
    # query map trimmed to the slowest entries until the serialized
    # line fits well inside the tail window — so the final stdout
    # line is always complete, parseable JSON.
    os.makedirs(RESULTS_DIR, exist_ok=True)
    full_path = os.path.join(RESULTS_DIR, "bench_full.json")
    with open(full_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    # reference-shape attempt ledger: one entry per bench run, Success
    # iff every query timed without error (attemptwriter.sh semantics:
    # a run that produced no usable result is Fail -missing)
    write_attempt(
        os.path.join(RESULTS_DIR, "attempts.log"),
        n=n_scale,
        k=0,
        ls=ls,
        bs=len(timings),
        dev="spark-local",
        status=0 if not errors else 1,
    )
    print(json.dumps(compact_summary(out, full_path)), flush=True)


if __name__ == "__main__":
    main()
