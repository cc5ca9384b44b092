"""Watermark semantics: events arriving after the (checkpoint-restored)
watermark has passed their window are dropped from the streaming
aggregation.

Empirical note (Spark 4.1): within a *single* availableNow run the
watermark advances between micro-batches but late input in a later
micro-batch of the same run is still admitted; the authoritative
late-drop happens against the watermark restored from the checkpoint
at query (re)start. The test therefore models the production scenario:
run 1 processes on-time data and commits its watermark; run 2 restarts
from the checkpoint and receives only late data — all of it must be
dropped."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents


@pytest.fixture()
def split_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # ts may arrive as TIMESTAMP_NTZ (not castable to double); go through
    # TIMESTAMP first — session tz is UTC so the cast is wall-clock-safe.
    sec = F.col("ts").cast("timestamp").cast("double")
    ts_cut = events.select(F.percentile(sec, F.lit(0.1)).alias("c")).collect()[0].c
    on_time = events.filter(sec > ts_cut)
    late = events.filter(sec <= ts_cut)
    assert late.count() > 0
    return on_time, late


def test_late_data_dropped_after_restart(spark, split_events):
    on_time, late = split_events
    # watermarks require TIMESTAMP (LTZ); the fixture may be NTZ
    on_time = on_time.withColumn("ts", F.col("ts").cast("timestamp"))
    late = late.withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        out = f"{d}/out"
        os.makedirs(src)
        on_time.coalesce(1).write.parquet(f"{src}/batch_a")
        schema = spark.read.parquet(f"{src}/batch_a").schema

        def run():
            stream = spark.readStream.schema(schema).parquet(f"{src}/batch_*")
            agg = (
                stream.withWatermark("ts", "0 seconds")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    (F.sum(cents("value")) / 100.0).alias("total_value"),
                )
                .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
            )
            q = (
                agg.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", f"{d}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.read.parquet(out)

        r1 = run()
        n_windows_1, n_events_1 = r1.count(), r1.agg(F.sum("n_events")).collect()[0][0]
        # append mode withholds the still-open final window
        assert n_events_1 < on_time.count()
        assert n_events_1 > 0

        # late file arrives after restart: watermark restored from the
        # checkpoint must drop every late event
        late.coalesce(1).write.parquet(f"{src}/batch_b")
        r2 = run()
        assert r2.count() == n_windows_1
        assert r2.agg(F.sum("n_events")).collect()[0][0] == n_events_1
        # and no late-only window ever appears (the boundary hour can
        # legitimately exist via its on-time members, hence >=)
        late_max_start = (
            late.select(F.date_trunc("hour", F.max("ts")).alias("m")).collect()[0].m
        )
        assert r2.agg(F.min("window_start")).collect()[0][0] >= late_max_start
