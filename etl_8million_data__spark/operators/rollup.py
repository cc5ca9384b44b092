"""Hypertable-style hierarchical time rollups (continuous aggregates).

The TimescaleDB/Druid pattern re-expressed in Spark: materialize a
fine-grained (hour) aggregate of the event stream once, then answer
every coarser-grained (day/week) query by RE-AGGREGATING the rollup
instead of the raw events — sums of partial sums, counts of partial
counts. At 100 TB the rollup is orders of magnitude smaller than the
fact, so dashboard-style queries never touch raw data; late-arriving
events refresh only the hour buckets they land in (keyed upsert), and
every coarser grain inherits the fix on the next read.

All measures must be algebraic (sum/count/min/max — things that merge).
Averages are derived at read time from sum+count; never materialize an
avg in a rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_8million_data__spark.functions.exact import cents


def hourly_rollup(events: DataFrame) -> DataFrame:
    """events -> (hour_start, event_type, n_events, sum_value_cents,
    max_value): the finest materialized grain."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("sum_value_cents"),
            F.max("value").alias("max_value"),
        )
    )


def reaggregate_daily(rollup: DataFrame) -> DataFrame:
    """Coarsen the hour rollup to days by merging partials — no raw
    scan. Algebraic merge: sum<-sum, count<-sum, max<-max."""
    return (
        rollup.groupBy(
            F.date_trunc("day", F.col("hour_start")).alias("day_start"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_cents").alias("sum_value_cents"),
            F.max("max_value").alias("max_value"),
        )
    )


def refresh_rollup(
    spark, late_events: DataFrame, rollup_path: str
) -> None:
    """Incremental refresh for late data: recompute ONLY the hour
    buckets the late events touch (merge their partials with the stored
    ones), then upsert those buckets into the materialized rollup —
    O(affected hours), not O(table)."""
    from etl_8million_data__spark.operators.upsert import upsert_parquet

    delta = hourly_rollup(late_events)
    existing = spark.read.parquet(rollup_path)
    # Monotonic refresh token: strictly above every version already in
    # the snapshot, so last-writer-wins always prefers the re-merged
    # bucket over the stored one (a constant would tie after the first
    # refresh and pick nondeterministically).  One-row driver read of
    # the small materialized rollup — not a fact-table scan.
    if "_v" in existing.columns:
        prev_v = existing.agg(F.max("_v")).first()[0] or 0
        existing = existing.drop("_v")
    else:
        prev_v = 0
    touched = delta.select("hour_start", "event_type").distinct()
    merged = (
        existing.join(
            touched.withColumnRenamed("hour_start", "h").withColumnRenamed(
                "event_type", "t"
            ),
            (F.col("hour_start") == F.col("h")) & (F.col("event_type") == F.col("t")),
            "inner",
        )
        .select(existing["*"])
        .unionByName(delta)
        .groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_cents").alias("sum_value_cents"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("_v", F.lit(prev_v + 1))
    )
    upsert_parquet(
        spark,
        merged,
        rollup_path,
        keys=["hour_start", "event_type"],
        order_col="_v",
    )
