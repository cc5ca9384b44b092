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
