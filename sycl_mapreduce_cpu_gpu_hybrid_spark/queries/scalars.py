"""Scalar function packs (SURVEY.md §2.8): JSON extraction and
date/time arithmetic over the ``events`` stream table, plus
string / math / array (higher-order) packs. All JVM built-ins —
no Python in any row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (get_json_object) + typed from_json struct
    read of ``props``, aggregated per event type."""
    from ..sources.tables import fan_out

    # JSON parsing is heavy per-row work (two Jackson parses per row)
    # and sf0.1 events arrives as ONE 2MB split — spread the scan
    # (the text_repetition/fan_out rule; measured 1.08 -> ~0.2s)
    e = fan_out(_t(spark, sf_dir, "events"), min_bytes=1_000_000)
    parsed = e.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.from_json("props", "k INT").getField("k").alias("k_struct"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # exact integer fixed-point average (scale 1e4): integer
        # arithmetic is bit-identical across engines, unlike a rounded
        # binary double (r2) or a DECIMAL cast (r3), both of which the
        # driver's value hash rejected for this column
        F.expr("(sum(k_path) * 10000) DIV nullif(count(k_path), 0)").alias("avg_k_e4"),
        F.sum(F.col("k_struct")).alias("sum_k"),
    )


def events_time_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time bucketing pack: date_trunc tumbling day buckets (the batch
    shape of a streaming tumbling window) crossed with hour-of-day
    extraction — one groupBy exercises both time-part surfaces, and
    per-day / per-hour histograms are its marginals."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.hour("ts").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def date_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval add, datediff, date-part extraction — plus the map-type
    function surface (construct, merge, look up, count, sort keys) —
    over the same 1000-order slice, one scan."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    m = F.map_concat(
        F.create_map(F.lit("status"), F.col("o_orderstatus")),
        F.create_map(F.lit("prio"), F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias("d30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("age_days"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.element_at(m, "status").alias("status"),
        F.element_at(m, "prio").alias("prio"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
    )


def string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper / length / substring / concat_ws / regexp_extract on part."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 3).alias("name3"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


def math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt / ln / pow / abs / ceil / floor on lineitem."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("pow_disc"),
        F.abs(F.col("l_quantity") - 25).cast("double").alias("abs_dev"),
        F.ceil("l_tax").alias("ceil_tax"),
        F.floor("l_tax").alias("floor_tax"),
    )


def array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings: size, element
    access, L2 norm via transform+aggregate, array max — all computed
    in double precision so the value hash is accumulation-stable."""
    em = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 200)
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("e0"),
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double)),"
                    " cast(0 AS double), (a, x) -> a + x)"
                )
            ),
            6,
        ).alias("l2_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    )


QUERIES = {
    "events_json_extract": events_json_extract,
    "events_time_agg": events_time_agg,
    "date_map_pack": date_map_pack,
    "string_pack": string_pack,
    "math_pack": math_pack,
    "array_pack": array_pack,
}

ORACLES = {
    "events_json_extract": """
        SELECT event_type, count(*) AS n,
               CAST((sum(CAST(json_extract_string(props, '$.k') AS INT)) * 10000)
                    // nullif(count(CAST(json_extract_string(props, '$.k') AS INT)), 0)
                    AS BIGINT) AS avg_k_e4,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
    "events_time_agg": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(extract(hour FROM ts) AS INT) AS hod,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "date_map_pack": """
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d30,
               CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS age_days,
               CAST(extract(year FROM o_orderdate) AS INT) AS yr,
               CAST(extract(month FROM o_orderdate) AS INT) AS mo,
               CAST(extract(day FROM o_orderdate) AS INT) AS dom,
               o_orderstatus AS status,
               o_orderpriority AS prio,
               2 AS n_keys,
               'prio,status' AS keys_csv
        FROM orders WHERE o_orderkey <= 1000
    """,
    "string_pack": """
        SELECT p_partkey,
               upper(p_brand) AS brand_uc,
               CAST(length(p_name) AS INT) AS name_len,
               substr(p_name, 1, 3) AS name3,
               concat_ws('-', p_brand, p_type) AS brand_type,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word
        FROM part WHERE p_partkey <= 500
    """,
    "math_pack": """
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_quantity), 6) AS sqrt_qty,
               round(ln(l_extendedprice), 6) AS ln_price,
               round(pow(l_discount + 1, 2), 6) AS pow_disc,
               abs(l_quantity - 25) AS abs_dev,
               CAST(ceil(l_tax) AS BIGINT) AS ceil_tax,
               CAST(floor(l_tax) AS BIGINT) AS floor_tax
        FROM lineitem WHERE l_orderkey <= 500
    """,
    "array_pack": """
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
               round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val
        FROM embeddings WHERE vec_id <= 200
    """,
}
