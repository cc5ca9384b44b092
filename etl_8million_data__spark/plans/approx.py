"""Approximate aggregates — the sketch family (SURVEY §2.4 notes these
come free in Spark). No DuckDB oracle (sketch implementations differ by
engine); registered rows-only for the driver, with accuracy-tolerance
tests against the exact forms in tests/test_approx.py.

At 100 TB these are the difference between a shuffle of |distinct keys|
and a few KB of sketch per partition."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.plans.registry import register


@register(
    "approx_distinct_users_hll",
    oracle=None,
    tags=("approx", "hll", "agg"),
)
def approx_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event_type (rsd 2%)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_percentile_prices",
    oracle=None,
    tags=("approx", "percentile", "agg"),
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) of order values at
    p50/p90/p99, accuracy 10000."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("pcts"),
        F.count(F.lit(1)).alias("n_orders"),
    ).select(
        F.col("pcts")[0].alias("p50"),
        F.col("pcts")[1].alias("p90"),
        F.col("pcts")[2].alias("p99"),
        "n_orders",
    )


@register(
    "sketch_kmv_distinct_customers",
    oracle="""
    WITH h AS (
      SELECT DISTINCT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(8), i -> CAST(
                   strpos('0123456789abcdef',
                          md5(CAST(c_custkey AS VARCHAR))[i+1:i+1]) - 1 AS BIGINT))),
               (a, x) -> a * 16 + x) AS h
      FROM customer),
    k AS (SELECT h FROM h ORDER BY h LIMIT 64)
    SELECT CASE WHEN count(*) < 64 THEN count(*) * 1.0
                ELSE 63 * 4294967296.0 / max(h) END AS est_distinct,
           count(*) AS k_used
    FROM k
    """,
    tags=("sketch", "kmv", "approx", "extension"),
)
def sketch_kmv_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (k=64): keep the k
    smallest 32-bit hashes of the key; estimate = (k-1) / kth-min
    (normalized). Unlike HLL the sketch is a deterministic function of
    the input set — md5-derived hashes are engine-portable — so this
    approximate operator still gets an EXACT oracle. Mergeable across
    partitions/tables by unioning hash sets and re-truncating to k."""
    from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8

    c = load_table(spark, sf_dir, "customer")
    h = hex_prefix_int(md5_utf8(F.col("c_custkey").cast("string")), 8)
    top = c.select(h.alias("h")).distinct().orderBy("h").limit(64)
    return top.agg(
        F.count(F.lit(1)).alias("_k"), F.max("h").alias("_mx")
    ).select(
        F.when(F.col("_k") < 64, F.col("_k") * 1.0)
        .otherwise(63 * 4294967296.0 / F.col("_mx"))
        .alias("est_distinct"),
        F.col("_k").alias("k_used"),
    )
