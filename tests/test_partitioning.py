"""Sampled range-boundary chooser (operators/partitioning): the
deterministic 10% sample's split points must partition the FULL table
into near-equal-frequency ranges — the property a range-partitioned
sort/shuffle layout actually needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents
from etl_8million_data__spark.operators.partitioning import (
    portable_hash_permille,
    sampled_range_bounds,
)

SF = "/root/testdata/sf0.01"


def test_bounds_split_full_table_near_equally(spark):
    o = load_table(spark, SF, "orders")
    n_buckets = 8
    bounds = sampled_range_bounds(
        o, cents("o_totalprice"), "o_orderkey", n_buckets=n_buckets
    ).collect()
    assert len(bounds) == n_buckets - 1
    cuts = sorted(r.bound_value for r in bounds)
    assert cuts == [r.bound_value for r in sorted(bounds, key=lambda r: r.bound_no)]

    # bucket the FULL table by the sampled cuts; each bucket should get
    # ~1/8 of the rows (10% sample => a few % relative error)
    expr = F.lit(0)
    for c in cuts:
        expr = expr + F.when(cents("o_totalprice") > c, 1).otherwise(0)
    sizes = [
        r.n
        for r in o.groupBy(expr.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    total = sum(sizes)
    assert len(sizes) == n_buckets
    for s in sizes:
        assert abs(s - total / n_buckets) / (total / n_buckets) < 0.25, sizes


def test_sample_is_deterministic(spark):
    o = load_table(spark, SF, "orders")
    a = o.filter(portable_hash_permille(F.col("o_orderkey")) < 100).count()
    b = o.filter(portable_hash_permille(F.col("o_orderkey")) < 100).count()
    assert a == b
    # ~10% of the table, not wildly off (hash uniformity)
    n = o.count()
    assert 0.07 * n < a < 0.13 * n
