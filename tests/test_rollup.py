"""Hierarchical rollup: algebraic re-aggregation and O(affected-hours)
late-data refresh must reproduce a from-raw day aggregate exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.rollup import (
    hourly_rollup,
    reaggregate_daily,
    refresh_rollup,
)


def _daily_sig(df):
    return sorted(
        (str(r.day_start), r.event_type, r.n_events, r.sum_value_cents)
        for r in df.collect()
    )


def test_rollup_refresh_with_late_events(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(
        F.expr("percentile_approx(ts, 0.8)").alias("c")
    ).collect()[0]["c"]
    on_time = events.filter(F.col("ts") <= F.lit(cutoff))
    late = events.filter(F.col("ts") > F.lit(cutoff))
    assert late.count() > 0

    path = str(tmp_path / "rollup")
    hourly_rollup(on_time).write.parquet(path)
    refresh_rollup(spark, late, path)

    refreshed = spark.read.parquet(path).drop("_v")
    got = _daily_sig(reaggregate_daily(refreshed))
    want = _daily_sig(reaggregate_daily(hourly_rollup(events)))
    assert got == want

    # the refresh only rewrote partials for hours the late data touched:
    # untouched hour buckets are byte-identical to the original rollup
    orig = hourly_rollup(on_time)
    touched = (
        hourly_rollup(late).select("hour_start", "event_type").distinct().collect()
    )
    touched_keys = {(str(r.hour_start), r.event_type) for r in touched}
    kept = [
        r
        for r in refreshed.collect()
        if (str(r.hour_start), r.event_type) not in touched_keys
    ]
    orig_rows = {
        (str(r.hour_start), r.event_type): (r.n_events, r.sum_value_cents)
        for r in orig.collect()
    }
    for r in kept:
        assert orig_rows[(str(r.hour_start), r.event_type)] == (
            r.n_events,
            r.sum_value_cents,
        )


def test_rollup_second_refresh_converges(spark, sf_dir, tmp_path):
    """Two successive refreshes (once-broken path: the stored rollup
    carries _v after the first) must still reproduce the from-raw
    aggregate, with a strictly increasing version so the re-merged
    bucket beats the stored one deterministically."""
    events = load_table(spark, sf_dir, "events")
    c1, c2 = (
        events.agg(
            F.expr("percentile_approx(ts, 0.6)").alias("a"),
            F.expr("percentile_approx(ts, 0.8)").alias("b"),
        )
        .collect()[0]
    )
    on_time = events.filter(F.col("ts") <= F.lit(c1))
    late1 = events.filter((F.col("ts") > F.lit(c1)) & (F.col("ts") <= F.lit(c2)))
    late2 = events.filter(F.col("ts") > F.lit(c2))
    assert late1.count() > 0 and late2.count() > 0

    path = str(tmp_path / "rollup2")
    hourly_rollup(on_time).write.parquet(path)
    refresh_rollup(spark, late1, path)
    refresh_rollup(spark, late2, path)

    refreshed = spark.read.parquet(path)
    assert refreshed.agg(F.max("_v")).collect()[0][0] == 2
    got = _daily_sig(reaggregate_daily(refreshed.drop("_v")))
    want = _daily_sig(reaggregate_daily(hourly_rollup(events)))
    assert got == want


def test_revenue_concentration_is_pareto_shaped(spark, sf_dir):
    """Deciles ordered by spend must carry monotonically non-increasing
    revenue shares, the top decile must dominate the bottom, and the
    truncated micro shares must sum to within 10 ppm of 1."""
    from etl_8million_data__spark.plans import all_queries

    rows = sorted(
        all_queries()["orders_revenue_concentration"].build(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.share_micro for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))
    assert shares[0] > 2 * shares[-1]
    assert 1_000_000 - 10 <= sum(shares) <= 1_000_000
