from .events import (  # noqa: F401
    dedup_within_watermark,
    run_available_now,
    session_counts,
    sliding_avg,
    stateful_running_max,
    stream_events,
    stream_foreach_batch,
    stream_purchases_to_parquet,
    stream_to_parquet,
    stream_tumbling_to_table,
    tumbling_counts,
)
