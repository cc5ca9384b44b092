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
