"""Extension-surface queries: Structured Streaming, the pandas_udf
kernel registration path, and multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udf import vowel_ratio_udf
from ..operators.multimodal import attach_fake_media, byte_histogram_features
from ..sources.tables import load_table
from ..streaming.events import session_counts, stream_tumbling_to_table


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window gap-sessions per user (batch mode — the same
    expression streams; tests assert batch/stream agreement). Oracled
    via SQL gap-island detection (lag + cumulative new-session flag)."""
    return session_counts(load_table(spark, sf_dir, "events"), gap="30 minutes")


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events replayed through the streaming engine (file source ->
    watermark -> tumbling windows -> availableNow drain). The oracle
    is the batch equivalent — 1-hour window starts == date_trunc."""
    return stream_tumbling_to_table(spark, sf_dir)


def udf_vowel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas_udf kernel over documents —
    deliberately SQL-replicable so the Python kernel path itself
    passes the value-hash gate."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    vr = vowel_ratio_udf()
    return docs.select("doc_id", F.round(vr("text"), 4).alias("vowel_ratio"))


def udf_grouped_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate kernel (GROUPED_AGG pandas_udf) — the
    Mapped::operator+ combiner analog (src/GPU_Module/GPU.cpp:20-27)
    as a user-registered reduction: per-event-type RMS of value.
    SQL-replicable so the custom-agg path passes the value hash."""
    import numpy as np
    import pandas as pd

    from ..functions.udf import register_grouped_agg_kernel

    def rms(s: pd.Series) -> float:
        return float(np.sqrt(np.mean(np.square(s.to_numpy(dtype="float64")))))

    kernel = register_grouped_agg_kernel(spark, "rms_kernel", rms, "double")
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(kernel("value"), 4).alias("rms_value")
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: documents -> opaque payloads + typed
    metadata -> mapInPandas byte-histogram features (the stand-in for
    a decode/embed stage). Engine-side plumbing only — rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    feats = byte_histogram_features(attach_fake_media(docs))
    return feats.select(
        "media_id",
        "modality",
        F.size("features").alias("feat_dim"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


QUERIES = {
    "events_sessionization": events_sessionization,
    "stream_tumbling_counts": stream_tumbling_counts,
    "udf_vowel_ratio": udf_vowel_ratio,
    "udf_grouped_rms": udf_grouped_rms,
    "multimodal_features": multimodal_features,
}

ORACLES = {
    "events_sessionization": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts >= lag(ts) OVER w + INTERVAL '30 minutes'
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM numbered GROUP BY user_id, sid
    """,
    "stream_tumbling_counts": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
               event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "udf_grouped_rms": """
        SELECT event_type,
               round(sqrt(avg(value * value)), 4) AS rms_value
        FROM events GROUP BY event_type
    """,
    "udf_vowel_ratio": """
        SELECT doc_id,
               round(len(regexp_extract_all(text, '[aeiou]')) * 1.0
                     / greatest(length(text), 1), 4) AS vowel_ratio
        FROM documents WHERE doc_id < 200
    """,
}
