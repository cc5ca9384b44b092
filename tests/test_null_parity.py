"""Oracle parity on NULL-injected data — cases the committed fixtures
can't hit (they contain no NULL event values), exercising the
nulls-ordering contracts (Spark ASC = nulls FIRST vs DuckDB ASC =
nulls LAST) that the queries pin down explicitly."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import TABLES, load_table
from etl_8million_data__spark.plans import all_queries
from tests.oracle import compare

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory) -> str:
    """sf0.001 with ~5% NULL event values (single-file parquet so the
    DuckDB views resolve the same path Spark reads)."""
    sf = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        if t != "events":
            os.symlink(os.path.join(SRC, f"{t}.parquet"), sf / f"{t}.parquet")
    e = load_table(spark, SRC, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 20 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    stage = str(sf / "_events_stage")
    e.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, sf / "events.parquet")
    shutil.rmtree(stage)
    return str(sf)


@pytest.mark.parametrize(
    "name",
    [
        "winsorized_value_stats_per_type",  # rank order pins NULLS LAST
        "events_ohlc_hourly",
        "events_tumbling_hourly",
    ],
)
def test_null_values_match_oracle(spark, null_sf, name):
    q = all_queries()[name]
    ok, msg = compare(q.build(spark, null_sf), q.oracle, null_sf)
    assert ok, f"{name}: {msg}"


def test_comparator_negative_controls(spark):
    """The gate itself must have teeth: deliberately wrong oracles —
    value off by one, row missing, column renamed, int-vs-float class
    drift — must all FAIL the comparator, not slip through
    normalization."""
    from tests.oracle import compare

    df = spark.createDataFrame([(1, 10.5), (2, 20.5)], "k int, v double")
    good = (
        "SELECT k, CAST(v AS DOUBLE) AS v "
        "FROM (VALUES (1, 10.5), (2, 20.5)) t(k, v)"
    )
    ok, msg = compare(df, good, "/root/testdata/sf0.001")
    assert ok, msg
    # and the class-strictness itself: an UNcast DuckDB literal is
    # DECIMAL, which the type-tagged compare must refuse (this is the
    # HUGEINT/DECIMAL widening the comparator exists to catch)
    ok, _ = compare(
        df, "SELECT * FROM (VALUES (1, 10.5), (2, 20.5)) t(k, v)",
        "/root/testdata/sf0.001",
    )
    assert not ok
    bad = [
        good.replace("20.5", "20.6"),  # value drift
        "SELECT k, CAST(v AS DOUBLE) AS v FROM (VALUES (1, 10.5)) t(k, v)",
        good.replace("AS v", "AS w"),  # column rename
        "SELECT k, CAST(v AS BIGINT) AS v "
        "FROM (VALUES (1, 10), (2, 20)) t(k, v)",  # float->int class
    ]
    for sql in bad:
        ok, msg = compare(df, sql, "/root/testdata/sf0.001")
        assert not ok, f"comparator passed a wrong oracle: {sql} ({msg})"
