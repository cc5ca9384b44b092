"""Behavioral/event analytics: funnel conversion and cohort retention —
the standard product-analytics shapes over the events table, both with
exact DuckDB oracles (pure integer/timestamp logic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.plans.registry import register


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'signup') AS t_signup,
             min(ts) FILTER (event_type = 'click') AS t_click,
             min(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    stages AS (
      SELECT user_id,
             (t_signup IS NOT NULL) AS s1,
             (t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_click > t_signup) AS s2,
             (t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_click > t_signup AND t_purchase IS NOT NULL
              AND t_purchase > t_click) AS s3
      FROM firsts)
    SELECT count(*) FILTER (s1) AS signed_up,
           count(*) FILTER (s2) AS clicked_after_signup,
           count(*) FILTER (s3) AS purchased_after_click,
           count(*) AS total_users
    FROM stages
    """,
    tags=("behavioral", "funnel", "agg"),
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup -> first later click -> first later
    purchase) via conditional min-timestamps — one groupBy, no joins,
    no per-user iteration."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    stages = firsts.select(s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return stages.agg(
        cnt("s1").alias("signed_up"),
        cnt("s2").alias("clicked_after_signup"),
        cnt("s3").alias("purchased_after_click"),
        F.count(F.lit(1)).alias("total_users"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH weeks AS (
      SELECT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    cohorts AS (
      SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY user_id),
    activity AS (
      SELECT DISTINCT w.user_id, c.cohort_week,
             CAST((w.wk - c.cohort_week) / 7 AS INTEGER) AS week_offset
      FROM weeks w JOIN cohorts c ON w.user_id = c.user_id)
    SELECT cohort_week, week_offset, count(*) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("behavioral", "cohort", "retention"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort = week of first activity,
    cell = distinct users active at each week offset."""
    e = load_table(spark, sf_dir, "events")
    weeks = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        weeks.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
