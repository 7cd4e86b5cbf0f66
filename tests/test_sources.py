"""CSV/JSON round-trip + connector construction (SURVEY §2.1 ∅ row)."""

import pytest

from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.connectors import (
    read_jdbc,
    read_kafka_stream,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.files import (
    read_csv,
    read_json,
    sample_schema,
    write_csv,
    write_json,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table


def _sig(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = read_csv(spark, out, nation.schema)
    assert _sig(back, nation.columns) == _sig(nation, nation.columns)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    write_json(region, out)
    back = read_json(spark, out, region.schema)
    assert _sig(back, region.columns) == _sig(region, region.columns)


def test_sample_schema_bounded(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    schema = sample_schema(spark, out, "csv", sample_files=1)
    assert set(f.name for f in schema.fields) == set(nation.columns)


def test_jdbc_reader_is_parallel(spark):
    # no database in the container: assert the parallel-scan options
    # are wired, which is the scale-relevant contract
    with pytest.raises(Exception) as exc:
        read_jdbc(
            spark,
            url="jdbc:postgresql://localhost:1/nodb",
            table="t",
            partition_column="id",
            lower_bound=0,
            upper_bound=1000,
            num_partitions=8,
        ).count()
    # failure must be at connection time (driver/socket), not option
    # validation — proving the reader config itself is well-formed
    msg = str(exc.value)
    assert "partitionColumn" not in msg


def test_kafka_stream_builder(spark):
    reader = read_kafka_stream(spark, "localhost:9092", "events")
    # builder returns an un-loaded DataStreamReader ready for .load()
    assert hasattr(reader, "load")
