"""Structured Streaming over the ``events`` table (SURVEY.md §2.10 —
no reference counterpart; additive capability per the north star).

The batch/stream unification is the point: the same tumbling-window
aggregation expression runs as a batch groupBy or as a watermarked
streaming query, and the tests assert both produce identical results
(the streaming analog of the reference's device-1/2/3 agreement
invariant, SURVEY §5).

At cluster scale the source would be Kafka (`readStream.format
("kafka")`) — here the file source replays the parquet fixture, which
exercises the identical watermark/state machinery, and the
rate-micro-batch source (stream_rate_source_to_parquet) executes the
non-file admission path: offset tracking, checkpoint resume across
restarts, exactly-once append — everything a broker deployment uses
except the broker itself (descoped, SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..sources.tables import _ns_timestamp_cols


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table. Streaming sources need
    an explicit schema; ns-precision timestamps go through the same
    nanosAsLong + microsecond conversion as the batch loader."""
    path = f"{sf_dir}/events.parquet"
    ns_cols = set(_ns_timestamp_cols(path))
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(path).schema
    fields = [
        StructField(f.name, LongType() if f.name in ns_cols else f.dataType, f.nullable)
        for f in batch_schema
    ]
    # the file stream source requires a directory: stream the sf dir
    # with a glob pinned to the events file
    stream = (
        spark.readStream.schema(StructType(fields))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # us-precision no-tz parquet infers TIMESTAMP_NTZ, which watermarks
    # reject; session TZ is pinned UTC so the cast is value-identical.
    for f in stream.schema:
        if f.dataType.typeName() == "timestamp_ntz":
            stream = stream.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return stream


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. Works on a
    stream (late data beyond ``watermark`` dropped, state evicted per
    window close) and on a batch frame (watermark is a no-op there).
    Pass ``watermark=None`` when the stream is already watermarked
    upstream (e.g. after a dedup stage) — redefining it is an error."""
    src = (
        events.withWatermark("ts", watermark)
        if events.isStreaming and watermark is not None
        else events
    )
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window rolling stats (each event lands in width/slide
    windows). Emits count + rounded sum + the derived average; the
    hash-bearing columns are n/sum_value — round(avg) of doubles is
    NOT bit-stable across engines (authoring convention rule 3), so
    avg_value is excluded from the declared-query projection."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n", "sum_value", "avg_value")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-id dedup with bounded state:
    duplicates arriving within the watermark horizon are dropped,
    state for expired event-times is evicted (the streaming
    generalization of the reference sink's unordered_set dedup,
    src/main.cpp:62-70 — which would grow without bound on a stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_available_now(result: DataFrame, name: str, mode: str = "complete") -> None:
    """Drain the full backlog through the streaming engine
    (Trigger.AvailableNow) into an in-memory table ``name``.

    ``complete`` for windowed aggregations: in append mode a window
    only emits once the watermark passes its end, so the trailing
    windows of a finite backlog would be withheld in state forever.
    Row-level streams (e.g. dedup) use ``append``."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _n_committed(checkpoint: str) -> int:
    """Number of micro-batches durably committed at ``checkpoint`` —
    the engine's own offset ledger (one all-digit file per committed
    batch under commits/). Local-FS probe, same assumption as
    fingerprint_cache_dir."""
    import os

    d = os.path.join(checkpoint, "commits")
    if not os.path.isdir(d):
        return 0
    return sum(1 for p in os.listdir(d) if p.isdigit())


def _drain_complete_to_parquet(result: DataFrame, out_dir: str, checkpoint: str) -> None:
    """Drain a complete-mode aggregation through foreachBatch into ONE
    parquet dir (each batch overwrites with the full current result —
    idempotent under redelivery, so at-least-once becomes exactly-once;
    the last committed batch is the complete aggregate of the whole
    backlog). A re-run against a complete checkpoint drains nothing and
    leaves the durable result in place — restart-resume reuse, the same
    contract as stream_to_parquet's append sinks."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        result.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _drain_update_to_parquet(result: DataFrame, out_base: str, checkpoint: str) -> None:
    """Drain an update-mode stream through foreachBatch into
    batch-keyed parquet subdirs (b0, b1, ...): redelivery of a batch
    overwrites its own subdir, never duplicates — the idempotence rule
    foreachBatch requires. Readers glob ``{out_base}/b*``. Re-runs
    against a complete checkpoint drain nothing."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_base}/b{batch_id}")

    q = (
        result.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_tumbling_to_table(
    spark: SparkSession,
    sf_dir: str,
    name: str = "stream_tumbling",
    dedup_key: str | None = None,
    state_partitions: int | None = 8,
    rocksdb_state: bool = False,
) -> DataFrame:
    """End-to-end: stream the events fixture through watermarked
    tumbling windows, drain with availableNow, return the result.
    ``dedup_key`` inserts a dropDuplicatesWithinWatermark stage before
    the aggregation — the exactly-once ingestion guard (state bounded
    by the watermark horizon, not the stream length).

    ``state_partitions`` sizes the stateful shuffles: a streaming
    query's state partitioning is pinned at the first checkpoint, so
    it must be sized to *state cardinality* (distinct keys within the
    watermark horizon), never inherited from the batch shuffle
    parallelism — each state-store partition pays checkpoint IO per
    micro-batch whether or not it holds keys. Size up for a Kafka
    deployment with millions of in-horizon keys; pass ``None`` to
    inherit the session's shuffle parallelism.

    ``rocksdb_state`` switches the state store to the RocksDB
    provider: per-partition state then spills to local disk instead of
    living on the JVM heap — required once in-horizon state outgrows
    executor memory (e.g. id-dedup over a wide watermark). Local
    replays of tiny fixtures keep the default HDFS-backed in-memory
    provider (RocksDB's JNI + compaction overhead dominates at toy
    state sizes). Both knobs are pinned into the checkpoint at first
    start — changing either later means a new checkpoint.

    The shuffle/state-store overrides are scoped to a CLONED session
    (``spark.newSession()`` — shared SparkContext, isolated SQLConf),
    so batch queries running concurrently on the caller's session
    never observe the streaming conf; the returned DataFrame is bound
    to the clone (same JVM data, collectable anywhere).

    The sink is DURABLE (foreachBatch complete-overwrite parquet +
    checkpoint, keyed on the fixture fingerprint and the variant name):
    a re-run against an unchanged fixture resumes a complete
    checkpoint, drains nothing, and reads the persisted result back —
    restart-resume exactly-once, the r7 pattern the append-mode
    streaming queries already use. Single-process use per keyed tree
    (local-FS markers, no cross-process locking)."""
    from ..sources.tables import fingerprint_cache_dir

    base = fingerprint_cache_dir(sf_dir, f"stream_tumbling_{name}", "events")
    scoped = spark.newSession()
    src = stream_events(scoped, sf_dir)
    watermark: str | None = "2 hours"
    if dedup_key is not None:
        src = src.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
            [dedup_key]
        )
        watermark = None  # already declared upstream of the dedup
    result = tumbling_counts(src, watermark=watermark)
    if state_partitions is not None:
        scoped.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if rocksdb_state:
        scoped.conf.set(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
        )
    _drain_complete_to_parquet(result, f"{base}/state", f"{base}/ckpt")
    return scoped.read.parquet(f"{base}/state")


def stream_sliding_to_table(
    spark: SparkSession, sf_dir: str, name: str = "stream_sliding"
) -> DataFrame:
    """Sliding-window averages through the streaming engine (file
    source -> watermark -> 2h/1h sliding windows -> availableNow drain
    into a durable complete-overwrite parquet sink). Same
    session-scoping and restart-resume discipline as
    stream_tumbling_to_table."""
    from ..sources.tables import fingerprint_cache_dir

    base = fingerprint_cache_dir(sf_dir, "stream_sliding", "events")
    scoped = spark.newSession()
    src = stream_events(scoped, sf_dir)
    result = sliding_avg(src)
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    _drain_complete_to_parquet(result, f"{base}/state", f"{base}/ckpt")
    return scoped.read.parquet(f"{base}/state").select("win_start", "n", "sum_value")


def stream_running_max_to_table(
    spark: SparkSession, sf_dir: str, name: str = "stream_running_max"
) -> DataFrame:
    """applyInPandasWithState running-max through the streaming engine.
    Update mode emits one row per key per micro-batch that touched it;
    both state fields are monotone (count accumulates, max never
    decreases), so the final per-key state is recovered batching-
    independently with a max over the emitted rows — the query is
    deterministic whether the backlog replays as 1 micro-batch or 50.
    The emitted rows land in a durable batch-keyed parquet sink
    (foreachBatch, idempotent on batch id) so re-runs against an
    unchanged fixture resume the complete checkpoint and just read the
    sink back — restart-resume, same as the other durable drains."""
    from ..sources.tables import fingerprint_cache_dir

    base = fingerprint_cache_dir(sf_dir, "stream_rmax", "events")
    scoped = spark.newSession()
    src = stream_events(scoped, sf_dir)
    result = stateful_running_max(src)
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    _drain_update_to_parquet(result, f"{base}/sink", f"{base}/ckpt")
    return (
        scoped.read.parquet(f"{base}/sink/b*")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
    )


def stream_interval_join_to_table(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> DataFrame:
    """Stream-stream interval join: clicks joined to the purchases
    that follow within 1 hour, both sides watermarked so join state is
    EVICTED as event time advances — the property that makes a
    stream-stream join runnable forever (state holds only the
    watermark horizon, not the stream history). Inner join rows emit
    as soon as both inputs arrive (append mode withholds nothing for
    inner joins); the drained rows are aggregated per user in batch
    for a compact deterministic result.

    The fixture replays as a single availableNow micro-batch (one
    parquet file), so watermark eviction cannot drop true pairs here;
    on a live multi-batch stream the 2-hour watermark bounds both
    state size and how late a side may arrive."""
    scoped = spark.newSession()
    src = stream_events(scoped, sf_dir)
    clicks = (
        src.where(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        src.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts >= click_ts"
            " AND p_ts <= click_ts + INTERVAL 1 HOUR"
        ),
        "inner",
    ).select("user_id", "click_ts", "p_ts", "value")
    # join state keys = users in the watermark horizon (150 in the
    # fixture): 4 state partitions measured best locally; size to
    # horizon key-cardinality on a real deployment (see
    # stream_tumbling_to_table's state_partitions discussion)
    scoped.conf.set("spark.sql.shuffle.partitions", "4")
    # durable keyed sink: re-runs resume the complete checkpoint and
    # drain nothing (restart-resume exactly-once; inner-join append
    # rows are immutable once emitted, so the sink is append-safe)
    from ..sources.tables import fingerprint_cache_dir

    base = base_dir or fingerprint_cache_dir(sf_dir, "stream_ssjoin", "events")
    stream_to_parquet(joined, f"{base}/sink", f"{base}/ckpt")
    return (
        scoped.read.parquet(f"{base}/sink")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("value"), 2).alias("sum_purchase_value"),
        )
    )


def stream_enrich_to_table(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> DataFrame:
    """Stream-static enrichment join: the purchase stream joined to
    the customer dimension (broadcast — stateless, no watermark
    needed; the static side is re-resolvable per micro-batch, which
    is how slowly-changing dims refresh mid-stream). Drained rows
    aggregate per market segment in batch."""
    from ..sources.tables import load_table

    scoped = spark.newSession()
    src = stream_events(scoped, sf_dir)
    purchases = src.where(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )
    dim = load_table(scoped, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = purchases.join(F.broadcast(dim), "user_id")
    scoped.conf.set("spark.sql.shuffle.partitions", "4")
    from ..sources.tables import fingerprint_cache_dir

    base = base_dir or fingerprint_cache_dir(sf_dir, "stream_enrich", "events")
    stream_to_parquet(enriched, f"{base}/sink", f"{base}/ckpt")
    return (
        scoped.read.parquet(f"{base}/sink")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", key: str = "user_id"
) -> DataFrame:
    """Session-window aggregation: events for a key belong to one
    session while each is within ``gap`` of the previous; the window
    closes ``gap`` after the last event. Identical expression in batch
    and stream (session_window supports both); on a stream the
    watermark bounds session state. SQL-oracled in batch mode via
    gap-island detection (lag + cumulative new-session flags)."""
    src = events.withWatermark("ts", gap) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col(key),
            F.col("win.start").alias("session_start"),
            "n",
            "sum_value",
        )
    )


def stateful_running_max(
    events: DataFrame,
    key: str = "user_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running max of ``value`` with event count. The state tuple is the
    streaming analog of the reference's per-key accumulation
    (Mapped::operator+, src/GPU_Module/GPU.cpp:20-27) with explicit
    lifetime management — the piece Spark's built-in aggregates hide.

    Each micro-batch emits one row per updated key; state survives
    across batches and is bounded by the distinct-key count, never the
    event count. Pass ``timeout_minutes`` on a live (unbounded) stream
    to evict idle keys via processing-time timeout; leave it None for
    finite replays — a pending timeout keeps an availableNow drain
    alive until the wall clock reaches it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} long, n_events long, max_value double"
    state_schema = "n long, mx double"

    def update(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n], "max_value": [mx]})

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_to_parquet(result: DataFrame, path: str, checkpoint: str) -> None:
    """Append-mode parquet streaming sink with a checkpoint: the
    durable analog of the reference's output.txt sink
    (src/main.cpp:55-73) — exactly-once per micro-batch via the
    checkpoint/WAL, safe to restart. Drains the available backlog
    (availableNow) then stops."""
    q = (
        result.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_purchases_to_parquet(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> DataFrame:
    """Durable-sink roundtrip: stream the events fixture, keep the
    row-level purchase stream (stateless — append mode emits every row
    immediately; an aggregation here would withhold trailing windows
    until a watermark that never advances past a finite backlog),
    drain it into a parquet sink with a checkpoint (exactly-once per
    micro-batch), then read the files back and aggregate per day in
    batch. The returned frame is the proof the durable sink holds
    exactly the streamed rows. Conf stays on a cloned session, same as
    stream_tumbling_to_table. The base dir is keyed on the fixture
    fingerprint (one durable tree per fixture state): re-runs resume
    the complete checkpoint, drain nothing, and read the sink —
    restart-resume exactly-once, not a fresh re-ingest per call."""
    from ..sources.tables import fingerprint_cache_dir

    base = base_dir or fingerprint_cache_dir(sf_dir, "stream_pq", "events")
    scoped = spark.newSession()
    src = stream_events(scoped, sf_dir)
    purchases = src.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    stream_to_parquet(purchases, f"{base}/data", f"{base}/ckpt")
    back = scoped.read.parquet(f"{base}/data")
    return (
        back.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def stream_rate_source_to_parquet(
    spark: SparkSession,
    base_dir: str | None = None,
    rows_per_batch: int = 2000,
    n_batches: int = 5,
) -> DataFrame:
    """The NON-FILE streaming source path, end to end: the
    rate-micro-batch source generates offset-tracked synthetic rows
    (value = a monotonically increasing long — exactly ``rows_per_
    batch`` per micro-batch, deterministic by construction), drained
    through a checkpointed parquet sink over ``n_batches`` separate
    query STARTS against the same checkpoint. Each restart resumes
    from the committed offset — after k restarts the sink holds
    exactly values [0, k * rows_per_batch), never a duplicate, never
    a gap. This is the offset-tracking / checkpoint-resume /
    exactly-once-append machinery a Kafka deployment exercises, proven
    without a broker: swapping ``format("rate-micro-batch")`` for
    ``format("kafka")`` (sources/connectors.py:read_kafka_stream)
    changes the source admission only, not the state/commit path.
    Kafka itself is descoped (no broker exists in this environment or
    the reference's — SURVEY §2.1).

    The restart LOOP is driven by the checkpoint's own commit ledger,
    not a fixed iteration count: each pass starts a query that resumes
    from the committed offset and commits exactly one more batch, until
    ``n_batches`` are durably committed. A completed tree (kept under a
    parameter-keyed temp dir) is therefore reused READ-ONLY by later
    calls — the result is always exactly values
    [0, n_batches * rows_per_batch), whether this call performed all
    the restarts, some of them (crash recovery), or none (re-run).
    Single-process use per keyed tree, like the other durable sinks."""
    import os
    import tempfile

    base = base_dir or os.path.join(
        tempfile.gettempdir(),
        "smrgh_roundtrip",
        f"rate_{rows_per_batch}x{n_batches}",
    )
    scoped = spark.newSession()
    ckpt = f"{base}/ckpt"
    attempts = 0
    while _n_committed(ckpt) < n_batches:
        attempts += 1
        if attempts > 2 * n_batches + 2:
            raise RuntimeError(
                f"rate source made no commit progress at {ckpt} "
                f"({_n_committed(ckpt)}/{n_batches} after {attempts} starts)"
            )
        src = (
            scoped.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", str(rows_per_batch))
            .option("startTimestamp", 0)
            .option("advanceMillisPerBatch", 1000)
            .load()
        )
        stream_to_parquet(
            src.select("value"), f"{base}/data", ckpt
        )
    return scoped.read.parquet(f"{base}/data")


def stream_foreach_batch(
    result: DataFrame, sink, checkpoint: str
) -> None:
    """foreachBatch escape hatch: ``sink(batch_df, batch_id)`` runs
    arbitrary batch-DataFrame logic (merge/upsert, multi-table write)
    per micro-batch. The checkpoint makes redelivery at-least-once;
    sinks must be idempotent on (batch_id) — e.g. write to a
    batch-keyed path or MERGE on a key."""
    q = (
        result.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_cdc_upsert_to_state(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    base_dir: str | None = None,
) -> DataFrame:
    """CDC apply through the streaming engine: the events table poses
    as a keyed change feed (key = user_id, version = (ts, event_id)),
    split into ``n_files`` parquet files and drained ONE FILE PER
    MICRO-BATCH (maxFilesPerTrigger=1) through foreachBatch, which
    MERGEs each batch into a keyed parquet state — latest version
    wins. This is the streaming complement of the batch MERGE
    (queries/relational.py merge_upsert): same latest-wins semantics,
    applied incrementally with a checkpoint instead of in one shot.

    Correctness properties the declared query's oracle rides on:
    - the merge is an argmax over (ts, event_id) — associative and
      commutative, so the final state is independent of how the
      engine batches the feed;
    - re-delivery is idempotent: merging a batch twice is a no-op
      (max of max), the foreachBatch contract's requirement;
    - state stays key-grain: |users| rows regardless of feed length —
      the bounded-state shape that survives an unbounded CDC stream.
    The merged frame is localCheckpointed before the overwrite so the
    state dir is never read and rewritten in the same job.

    Storage: the default base dir is KEYED on the fixture fingerprint
    (sources.tables.fingerprint_cache_dir — r6 advice: mkdtemp per
    invocation accumulated feed+state+checkpoint trees under /tmp
    across bench/parity runs), so repeated runs against an unchanged
    fixture reuse one tree: the feed write is _SUCCESS-guarded, the
    checkpoint already covers the feed, availableNow finds nothing new,
    and the call returns the (deterministic) persisted state. A run
    killed mid-stream resumes from the checkpoint and converges to the
    same state — the merge is idempotent. Local filesystem only (the
    _SUCCESS probes and tempdir anchor assume one); cluster
    deployments pass an explicit shared-FS ``base_dir``."""
    import os

    from pyspark.sql import Window

    from ..sources.tables import fingerprint_cache_dir, load_table

    base = base_dir or fingerprint_cache_dir(sf_dir, "cdc_state", "events")
    feed, state_dir, ckpt = f"{base}/feed", f"{base}/state", f"{base}/ckpt"
    if not os.path.exists(os.path.join(feed, "_SUCCESS")):
        changes = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        changes.repartition(n_files).write.mode("overwrite").parquet(feed)

    scoped = spark.newSession()
    schema = scoped.read.parquet(feed).schema
    src = (
        scoped.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            merged_src = s.read.parquet(state_dir).unionByName(batch_df)
        else:
            merged_src = batch_df
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        merged = (
            merged_src.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint()
        )
        merged.write.mode("overwrite").parquet(state_dir)

    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state_dir)


def stream_dedup_to_table(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> DataFrame:
    """Streaming exactly-once-per-id dedup end to end: a feed with
    REAL duplicates (the full events table plus a second copy of the
    event_id % 3 == 0 slice, as separate parquet files) is drained
    through dropDuplicatesWithinWatermark (dedup_within_watermark)
    into a memory sink, then reduced to an exact integer digest per
    event_type. The feed is drained in ONE availableNow batch (no
    maxFilesPerTrigger) so the result is deterministic regardless of
    file enumeration order — multi-batch re-delivery semantics are
    exercised by stream_cdc_upsert, watermark-horizon eviction by the
    operator's unit tests. Oracle: the digest over the DISTINCT feed,
    i.e. the original table — streaming dedup must reproduce batch
    DISTINCT exactly.

    Storage keyed on the fixture fingerprint like the CDC state (one
    tree per fixture state, local FS)."""
    import os

    from ..sources.tables import fingerprint_cache_dir, load_table

    base = base_dir or fingerprint_cache_dir(sf_dir, "stream_dedup", "events")
    feed = f"{base}/feed"
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    # the feed is a TWO-step write (base copy + duplicate slice), and
    # the overwrite's own _SUCCESS lands after step one — guard on a
    # separate sentinel written only after the append, so a crash
    # between the steps can never leave a duplicate-free feed that
    # silently turns the dedup gate into a no-op (r7 advice)
    done = os.path.join(base, "_feed_complete")
    if not os.path.exists(done):
        # wipe the whole keyed tree first: a half-built feed may already
        # be covered by the checkpoint's file-source log, and rewriting
        # feed files under a live checkpoint would re-ingest them as new
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        ev = load_table(spark, sf_dir, "events").select(*cols)
        ev.coalesce(2).write.mode("overwrite").parquet(feed)
        dup = ev.where(F.col("event_id") % 3 == 0)
        dup.coalesce(1).write.mode("append").parquet(feed)
        with open(done, "w") as fh:
            fh.write("ok")

    scoped = spark.newSession()
    schema = scoped.read.parquet(feed).schema
    src = scoped.readStream.schema(schema).parquet(feed)
    for f in src.schema:
        if f.dataType.typeName() == "timestamp_ntz":
            src = src.withColumn(f.name, F.col(f.name).cast("timestamp"))
    deduped = dedup_within_watermark(src, watermark="1 hour")
    # durable sink + checkpoint under the SAME keyed base: a re-run
    # against an unchanged fixture resumes a complete checkpoint,
    # drains nothing, and reads the sink back — the restart-resume
    # exactly-once property, same as stream_cdc_upsert
    stream_to_parquet(deduped, f"{base}/sink", f"{base}/sink_ckpt")
    back = scoped.read.parquet(f"{base}/sink")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min("event_id").cast("bigint").alias("min_eid"),
        F.max("event_id").cast("bigint").alias("max_eid"),
        F.sum("event_id").cast("bigint").alias("sum_eid"),
    )
