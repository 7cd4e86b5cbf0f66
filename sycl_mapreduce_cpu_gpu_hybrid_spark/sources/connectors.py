"""JDBC / Kafka connectors (SURVEY §2.1 ∅ row).

The JDBC path is EXECUTED, not construction-only: Spark ships the
Apache Derby embedded engine (used by its Hive metastore), so
``derby_url`` + ``write_jdbc`` + ``read_jdbc`` round-trip through a
real database in tests — write batching, overwrite semantics, and the
partitioned parallel scan all run for real. Kafka remains
construction-only (no broker in the container); its tests assert the
built configuration. The option choices are the part that matters at
scale:

- JDBC reads are single-task unless a partition column + bounds are
  given; ``read_jdbc`` makes the parallel form the default signature.
- JDBC writes batch rows (``batchsize``) and cap writer parallelism —
  a 1000-task write is a connection storm against any real database.
- Kafka reads bound per-trigger intake (``maxOffsetsPerTrigger``) so a
  backlogged topic cannot produce an unbounded first micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """JDBC URL for the embedded Derby engine bundled with Spark —
    the in-container stand-in for a real warehouse database (one JVM
    owns an embedded database at a time; fine under local[*])."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_path}{suffix}"


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


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    max_write_tasks: int = 16,
    **options,
) -> None:
    """Batched JDBC write with capped parallelism: each task holds one
    connection, so writer tasks are bounded by ``max_write_tasks``
    (coalesce — no shuffle) rather than inheriting a large upstream
    partition count and storming the database with connections."""
    if df.rdd.getNumPartitions() > max_write_tasks:
        df = df.coalesce(max_write_tasks)
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**options)
        .mode(mode)
        .save()
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
