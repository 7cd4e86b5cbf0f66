"""Streaming tests: batch/stream result equivalence (the streaming
analog of the reference's device-agreement invariant), sliding
windows, and watermark dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table
from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
    dedup_within_watermark,
    run_available_now,
    sliding_avg,
    stream_events,
    tumbling_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_equals_batch_tumbling(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    streamed = tumbling_counts(stream_events(spark, sf_dir))
    run_available_now(streamed, "t_tumbling_eq", mode="complete")
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(spark.table("t_tumbling_eq"), cols) == _rows(batch, cols)


def test_stream_equals_batch_sliding(spark, sf_dir):
    batch = sliding_avg(load_table(spark, sf_dir, "events"))
    streamed = sliding_avg(stream_events(spark, sf_dir))
    run_available_now(streamed, "t_sliding_eq", mode="complete")
    cols = ["win_start", "avg_value"]
    assert _rows(spark.table("t_sliding_eq"), cols) == _rows(batch, cols)


def test_dedup_within_watermark(spark, sf_dir):
    stream = dedup_within_watermark(stream_events(spark, sf_dir))
    run_available_now(stream, "t_dedup_wm", mode="append")
    out = spark.table("t_dedup_wm")
    n_events = load_table(spark, sf_dir, "events").count()
    # fixture ids are unique, so dedup must be lossless here; the
    # operator's job is bounded state, not dropping unique rows
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_stream_equals_batch_session(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import session_counts

    batch = session_counts(load_table(spark, sf_dir, "events"))
    streamed = session_counts(stream_events(spark, sf_dir))
    run_available_now(streamed, "t_session_eq", mode="complete")
    cols = ["user_id", "session_start", "n", "sum_value"]
    assert _rows(spark.table("t_session_eq"), cols) == _rows(batch, cols)


def test_stateful_running_max(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
        stateful_running_max,
    )

    streamed = stateful_running_max(stream_events(spark, sf_dir))
    run_available_now(streamed, "t_stateful_max", mode="update")
    out = spark.table("t_stateful_max")
    # update mode: keep each key's last emission (max n_events)
    final = (
        out.groupBy("user_id")
        .agg(F.max_by("max_value", "n_events").alias("max_value"),
             F.max("n_events").alias("n_events"))
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("max_value"), F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["user_id", "n_events", "max_value"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_stream_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
        stream_to_parquet,
    )

    deduped = dedup_within_watermark(stream_events(spark, sf_dir))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_to_parquet(deduped, out, ckpt)
    back = spark.read.parquet(out)
    n = load_table(spark, sf_dir, "events").count()
    assert back.count() == n
    assert back.select("event_id").distinct().count() == n


def test_stream_foreach_batch_idempotent_paths(spark, sf_dir, tmp_path):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
        stream_foreach_batch,
    )

    base = str(tmp_path / "batches")

    def sink(batch_df, batch_id):
        # batch-keyed path: redelivery overwrites, never duplicates
        batch_df.write.mode("overwrite").parquet(f"{base}/b{batch_id}")

    stream_foreach_batch(
        dedup_within_watermark(stream_events(spark, sf_dir)),
        sink,
        str(tmp_path / "ckpt"),
    )
    back = spark.read.parquet(f"{base}/*")
    assert back.count() == load_table(spark, sf_dir, "events").count()


def test_rocksdb_state_store_agrees_and_restores_conf(spark, sf_dir):
    # same result under the RocksDB provider (the scale path once
    # in-horizon state outgrows executor memory), and both scoped
    # conf overrides restored afterwards
    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
        stream_tumbling_to_table,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prior_parts = spark.conf.get("spark.sql.shuffle.partitions")
    default = stream_tumbling_to_table(
        spark, sf_dir, name="t_state_default", dedup_key="event_id"
    )
    rocks = stream_tumbling_to_table(
        spark, sf_dir, name="t_state_rocks", dedup_key="event_id",
        rocksdb_state=True,
    )
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(rocks, cols) == _rows(default, cols)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior_parts
    assert spark.conf.get(key, None) is None


def test_rate_source_restart_exactly_once(spark):
    """Non-file source E2E: n_batches separate query starts against
    one checkpoint must yield exactly the contiguous value range —
    a duplicate (offset replayed) or gap (offset skipped) fails."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.streaming.events import (
        stream_rate_source_to_parquet,
    )

    df = stream_rate_source_to_parquet(spark, rows_per_batch=50, n_batches=3)
    vals = sorted(r["value"] for r in df.collect())
    assert vals == list(range(150))
