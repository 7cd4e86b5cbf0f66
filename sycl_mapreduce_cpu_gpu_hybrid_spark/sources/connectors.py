"""JDBC / Kafka connector builders (SURVEY §2.1 ∅ row).

No database or broker runs in the test container, so these are
*construction-only* surface: they assemble the reader/stream with the
scale-relevant options set correctly, and tests assert the built
configuration rather than a live connection. The option choices are
the part that matters at scale:

- JDBC reads are single-task unless a partition column + bounds are
  given; ``read_jdbc`` makes the parallel form the default signature.
- Kafka reads bound per-trigger intake (``maxOffsetsPerTrigger``) so a
  backlogged topic cannot produce an unbounded first micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    **options,
) -> DataFrame:
    """Parallel JDBC scan: ``num_partitions`` tasks each pull a range
    of ``partition_column``. The single-task form is deliberately not
    offered — at any real table size it is the wrong call."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
        .options(**options)
        .load()
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int = 1_000_000,
    **options,
):
    """Kafka micro-batch source returning the raw reader (call
    ``.load()`` where a broker exists). Values arrive as binary;
    downstream parses with from_json + an explicit schema."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .options(**options)
    )
