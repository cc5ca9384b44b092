"""Approximate aggregates stay within their error bounds of the exact
forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.plans import all_queries


def test_hll_within_rsd(spark, sf_dir):
    got = {
        r.event_type: r.approx_users
        for r in all_queries()["approx_distinct_users_hll"].build(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(got[et] - n) / n <= 0.1, (et, got[et], n)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    r = all_queries()["approx_percentile_prices"].build(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    exact = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("p50")).collect()[0].p50
    # GK sketch with accuracy 10000 on a few-thousand-row table is
    # near-exact; allow a loose 2% envelope
    assert abs(r.p50 - exact) / exact < 0.02
    assert r.p50 <= r.p90 <= r.p99
