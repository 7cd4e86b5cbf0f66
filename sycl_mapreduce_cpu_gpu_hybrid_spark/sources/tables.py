"""Loaders for the driver's test tables (TESTDATA.md).

Parquet scans are the engine's primary source: columnar, predicate
pushdown and column pruning reach the scan via Catalyst, partition
count follows spark.sql.files.maxPartitionBytes at cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects ([PARQUET_TYPE_ILLEGAL]). Footer-only read — no data I/O;
    memoized per path (fixtures are immutable and every load_table
    call would otherwise re-read the footer)."""
    if path in _NS_COLS_CACHE:
        return _NS_COLS_CACHE[path]
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        cols = [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        cols = []
    _NS_COLS_CACHE[path] = cols
    return cols


_NS_COLS_CACHE: dict[str, list[str]] = {}


_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def _source_stamp(path: str) -> tuple:
    """Cheap immutability stamp (size + mtime) for a parquet file or
    directory — a regenerated fixture changes the stamp, so a cached
    scan can never serve stale data."""
    try:
        st = os.stat(path)
        if os.path.isfile(path):
            return (st.st_size, st.st_mtime_ns)
        with os.scandir(path) as it:
            return tuple(
                sorted((e.name, e.stat().st_size, e.stat().st_mtime_ns) for e in it)
            )
    except OSError:
        return ("<unstattable>",)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; ns-precision timestamps are read as raw int64
    nanoseconds (``nanosAsLong``) and converted to microsecond
    timestamps (floor division — same truncation DuckDB applies when it
    narrows TIMESTAMP_NS to its µs TIMESTAMP).

    The returned (lazy, immutable) frame is memoized per SESSION and
    source stamp: ``spark.read.parquet`` pays a schema-resolution
    footer job plus several py4j roundtrips on every call, pure
    declaration overhead for a fixture that never changes mid-run.
    Sessions are held weakly, so ephemeral scoped clones (streaming)
    don't pin their frames."""
    path = f"{sf_dir}/{name}.parquet"
    per_session = _cache_for(spark)
    key = ("table", path, _source_stamp(path))
    if key in per_session:
        return per_session[key]
    df = _load_table_uncached(spark, path)
    _cache_insert(per_session, key, df)
    return df


def _cache_for(spark: SparkSession) -> dict:
    global _TABLE_CACHE
    import weakref

    if _TABLE_CACHE is None:
        _TABLE_CACHE = weakref.WeakKeyDictionary()
    return _TABLE_CACHE.setdefault(spark, {})


def _cache_insert(per_session: dict, key: tuple, df: DataFrame) -> None:
    """Insert under a (namespace, path, stamp) key, evicting superseded
    stamps of the same (namespace, path) — without this, every
    republished layout/fixture leaks one dead lazy frame into the
    per-session dict for the session's lifetime (r14 advisory). The
    namespace tag keeps load_table frames (which carry the
    nanosAsLong -> timestamp_micros rewrite) from ever being served
    through read_layout (raw reads) or vice versa."""
    ns, path, _stamp = key
    stale = [k for k in per_session if k[0] == ns and k[1] == path and k != key]
    for k in stale:
        del per_session[k]
    per_session[key] = df


def _load_table_uncached(spark: SparkSession, path: str) -> DataFrame:
    ns_cols = _ns_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # Scope the legacy flag to this read: the reader captures it at
    # DataFrame creation (verified: execution after restore still
    # reads longs), so restoring immediately keeps unrelated
    # spark.read.parquet calls in the session on the loud
    # PARQUET_TYPE_ILLEGAL behavior instead of silently yielding longs.
    flag = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(flag, None)
    spark.conf.set(flag, "true")
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution under the flag
    finally:
        if prior is None:
            spark.conf.unset(flag)
        else:
            spark.conf.set(flag, prior)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


_PARTS_CACHE: dict[tuple[str, int], int] = {}


def scan_num_partitions(df: DataFrame) -> int:
    """``df.rdd.getNumPartitions()`` memoized per (application,
    canonical plan): the RDD conversion runs the full driver-side
    analysis + physical-planning pipeline and a py4j roundtrip —
    ~0.1-0.2s of pure declaration overhead PER CALL, paid again on
    every re-declaration of a query that probes its scan (r7 verdict).
    The partition count of a given plan is stable within one
    application (fixtures are immutable; the split math depends only
    on session confs that don't change mid-run), so key the memo on
    ``semanticHash`` — one cheap analysis-only roundtrip — and pay the
    RDD conversion once per distinct plan."""
    sc = df.sparkSession.sparkContext
    try:
        key = (sc.applicationId, df.semanticHash())
    except Exception:  # non-classic backends: fall through uncached
        return df.rdd.getNumPartitions()
    if key not in _PARTS_CACHE:
        _PARTS_CACHE[key] = df.rdd.getNumPartitions()
    return _PARTS_CACHE[key]


def fan_out(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Round-robin the scan to ``defaultParallelism`` partitions when
    it arrives with fewer — a CPU-parallelism fix for heavy PER-ROW
    expression work (array builds, regex packs, n-gram explodes) on
    mid-size inputs that land as a handful of parquet files. At 100 TB
    the scan already yields >= cores splits and this is a no-op; the
    Exchange it inserts on small inputs moves the raw rows ONCE,
    before the expensive projection, and is repaid many times over
    (measured: text_repetition 12.1s -> sub-second at sf0.1, which
    arrives as ONE split). Same rule as operators/kmer._should_spread
    and text.lang_id.

    ``min_bytes``: skip the exchange when Catalyst's plan-size stat is
    below this floor — for kernels whose per-byte cost is low enough
    that on tiny inputs the exchange + task overhead exceeds the
    single-core work it parallelizes (the kmer SPREAD_MIN_CHARS rule,
    generalized; no job is run to probe)."""
    sc = df.sparkSession.sparkContext
    if scan_num_partitions(df) >= sc.defaultParallelism:
        return df
    if min_bytes > 0:
        from ..operators.kmer import _plan_size_bytes

        size = _plan_size_bytes(df)
        if size is not None and size < min_bytes:
            return df
    return df.repartition(sc.defaultParallelism)


def fingerprint_cache_dir(sf_dir: str, kind: str, table: str) -> str:
    """Written-once derived-copy location, keyed on a FINGERPRINT of
    the source parquet (absolute path + per-file size + mtime) and
    anchored under the system temp dir: regenerating the fixture or
    running from a different CWD changes/relocates the key, so a stale
    copy can never be read against a fresh oracle (r5 advice), and
    repeated bench/parity runs reuse ONE tree instead of accumulating
    mkdtemp leftovers (r6 advice). Callers guard their writes on a
    _SUCCESS marker inside the keyed dir, making them idempotent per
    fixture state. Local-filesystem paths only (os.stat on the source,
    tempdir anchor) — cluster deployments point derived state at a
    shared filesystem instead."""
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, f"{table}.parquet")
    h = hashlib.sha256(os.path.abspath(src).encode())
    files = (
        [src]
        if os.path.isfile(src)
        else [os.path.join(src, p) for p in sorted(os.listdir(src))]
    )
    for p in files:
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns};".encode())
    return os.path.join(
        tempfile.gettempdir(),
        "smrgh_roundtrip",
        f"{kind}_{table}_{h.hexdigest()[:16]}",
    )


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet`` over a published write-once
    layout (r14): the read itself is pure declaration, but its
    schema-resolution/file-listing step launches one small Spark job
    per call, which (a) costs ~0.3-0.5 s of py4j + scheduling per
    re-declaration and (b) trips the declared-plan cache's purity
    guard (queries/__init__._prepared), so every consumer re-paid its
    WHOLE declaration forever. Layouts are immutable once their
    ``_SUCCESS`` marker exists, so the lazy frame is memoized with the
    same session + source-stamp key as :func:`load_table` — a
    republished layout (new fingerprint dir, or a pruned-and-rebuilt
    one) changes the stamp and can never be served stale. Every
    materialization still scans the layout files. Keys are
    namespaced apart from load_table's (see _cache_insert) and
    superseded stamps are evicted on insert."""
    per_session = _cache_for(spark)
    key = ("layout", path, _source_stamp(path))
    if key not in per_session:
        _cache_insert(per_session, key, spark.read.parquet(path))
    return per_session[key]


def layout_rows(path: str) -> int | None:
    """Footer row count of a published layout dir — O(files) metadata,
    zero Spark jobs (the table_rows pattern for layouts). None when
    the path isn't a readable local parquet dir."""
    try:
        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    except OSError:
        return None


def publish_layout_atomic(write_fn, path: str) -> None:
    """Race-safe publication for the write-once layouts (r13
    advisory): the bare check-then-write on _SUCCESS admits two
    concurrent sessions (bench + parity on the same fixture) both
    running mode('overwrite') into the SAME directory, or one reading
    a half-overwritten tree. ``write_fn(tmp_path)`` writes the layout
    into a pid-suffixed temp sibling; the publish is one atomic
    ``os.rename`` (same filesystem — both live under the
    smrgh_roundtrip root). If a concurrent publisher won the rename,
    the loser discards its copy and the caller reads the winner's —
    the builds are deterministic per fixture fingerprint, so either
    copy is correct. Temp dirs never match prune_layout_variants'
    name pattern, so GC cannot delete an in-flight build."""
    import shutil

    tmp = f"{path}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        write_fn(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise


def prune_layout_variants(current: str, kind_family: str, table: str) -> None:
    """Best-effort GC of superseded roundtrip layouts (r9 advice):
    kinds that embed a parallelism suffix (``csv8`` vs ``csv32``) or a
    stale fixture fingerprint would otherwise accumulate one full
    written copy per (parallelism, fixture-state) forever. Deletes
    every sibling ``{family}[N]_{table}_{fp}`` dir other than
    ``current`` — safe because the writes are idempotent (a concurrent
    session with a different layout key just re-writes its copy)."""
    import re
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "smrgh_roundtrip")
    if not os.path.isdir(root):
        return
    pat = re.compile(
        rf"^{re.escape(kind_family)}\d*_{re.escape(table)}_[0-9a-f]{{16}}$"
    )
    cur = os.path.abspath(current)
    for name in os.listdir(root):
        path = os.path.join(root, name)
        if os.path.abspath(path) != cur and pat.match(name):
            shutil.rmtree(path, ignore_errors=True)
