"""Streaming twins must agree with their oracle-checked batch forms."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from etl_8million_data__spark.plans import all_queries
from etl_8million_data__spark.streaming.jobs import (
    dedup_stream,
    read_events_stream,
    run_available_now,
    session_windows_stream,
    stream_upsert_to_parquet,
    tumbling_hourly_stream,
)


@pytest.fixture()
def ckpt():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir, ckpt):
    stream = tumbling_hourly_stream(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "t_tumbling", "complete", ckpt)
    batch = all_queries()["events_tumbling_hourly"].build(spark, sf_dir)
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_session_stream_emits_closed_sessions(spark, sf_dir, ckpt):
    events = read_events_stream(spark, sf_dir)
    got = run_available_now(
        session_windows_stream(events), "t_sessions", "append", ckpt
    )
    batch = all_queries()["events_session_windows"].build(spark, sf_dir)
    # final watermark = max event time (0s delay): only sessions whose
    # end <= watermark are emitted in append mode
    from etl_8million_data__spark.catalog import load_table

    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    expected = batch.filter(F.col("session_end") <= F.lit(max_ts))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(expected, cols)
    assert got.count() > 0


def test_dedup_stream_within_watermark(spark, sf_dir, ckpt):
    events = read_events_stream(spark, sf_dir)
    got = run_available_now(
        dedup_stream(events, ["user_id", "event_type"]), "t_dedup", "append", ckpt
    )
    from etl_8million_data__spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    # single availableNow pass over one file -> exact one-per-key dedup
    assert got.count() == n_keys
    assert got.select("user_id", "event_type").distinct().count() == n_keys


def test_stream_static_join(spark, sf_dir, ckpt):
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.streaming.jobs import enriched_events_stream

    customer = load_table(spark, sf_dir, "customer")
    stream = enriched_events_stream(read_events_stream(spark, sf_dir), customer)
    got = run_available_now(stream, "t_enriched", "append", ckpt)
    events = load_table(spark, sf_dir, "events")
    batch = events.join(
        customer.selectExpr("c_custkey AS user_id", "c_name", "c_mktsegment"),
        "user_id",
        "left",
    )
    assert got.count() == events.count() == batch.count()
    cols = ["event_id", "c_name", "c_mktsegment"]
    assert _rows(got.select(*cols), cols) == _rows(batch.select(*cols), cols)


def test_stream_upsert_foreachbatch(spark, sf_dir, ckpt):
    events = read_events_stream(spark, sf_dir)
    with tempfile.TemporaryDirectory() as outdir:
        path = f"{outdir}/latest_events"
        q = stream_upsert_to_parquet(
            events, path, keys=["user_id", "event_type"], order_col="ts", checkpoint_dir=ckpt
        )
        q.awaitTermination()
        snap = spark.read.parquet(path)
        from etl_8million_data__spark.catalog import load_table

        e = load_table(spark, sf_dir, "events")
        n_keys = e.select("user_id", "event_type").distinct().count()
        assert snap.count() == n_keys
        # last-writer-wins: the kept ts per key is the max ts
        got_max = _rows(snap.groupBy("user_id", "event_type").agg(F.max("ts").alias("ts")),
                        ["user_id", "event_type", "ts"])
        exp_max = _rows(e.groupBy("user_id", "event_type").agg(F.max("ts").alias("ts")),
                        ["user_id", "event_type", "ts"])
        assert got_max == exp_max


def test_stream_stream_join_matches_batch(spark, sf_dir, ckpt):
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.streaming.jobs import click_purchase_pairs_stream

    got = run_available_now(
        click_purchase_pairs_stream(read_events_stream(spark, sf_dir)),
        "t_ss_join",
        "append",
        ckpt,
    )
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    batch = p.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") < F.col("pts")),
        "inner",
    ).select("purchase_id", "click_id", "user_id")
    cols = ["purchase_id", "click_id", "user_id"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 0


def test_doc_quality_profile_stream_matches_batch(spark, sf_dir, ckpt):
    """Replaying documents as a stream must reproduce the batch
    per-source quality profile bit-for-bit (micro-int metrics make the
    aggregation order-insensitive)."""
    import os

    from etl_8million_data__spark.streaming.jobs import doc_quality_profile_stream

    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    stage = tempfile.mkdtemp()
    os.symlink(path, os.path.join(stage, "documents.parquet"))
    stream = spark.readStream.schema(schema).parquet(stage)

    got = run_available_now(
        doc_quality_profile_stream(stream), "t_docquality", "complete", ckpt
    )
    want = all_queries()["corpus_quality_profile_by_source"].build(spark, sf_dir)
    cols = ["source", "n_docs", "total_tokens", "avg_stopword_ratio", "avg_alpha_ratio"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_probe_scores_match_batch_and_replay_noop(spark, sf_dir, tmp_path):
    """Streaming micro-batches scored against FROZEN persisted probe
    weights must equal the batch query's scores exactly (the scorer is
    one integer map — no training state to drift), and a full replay
    must be a no-op (skip-existing by vec_id)."""
    import os

    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.probe import linear_probe_fit, save_probe
    from etl_8million_data__spark.streaming.jobs import stream_probe_score_increment

    emb = load_table(spark, sf_dir, "embeddings")
    scored, w = linear_probe_fit(
        emb, F.when(F.col("label") < 5, 1).otherwise(-1), iters=8
    )
    weights_path = str(tmp_path / "probe_weights")
    save_probe(w, weights_path)
    want = {r.vec_id: r.score_micro for r in scored.collect()}

    out = str(tmp_path / "scores")
    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = spark.read.parquet(path).schema
    stage = str(tmp_path / "stage")
    os.mkdir(stage)
    os.symlink(path, os.path.join(stage, "embeddings.parquet"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema).parquet(stage).select("vec_id", "embedding")
        )
        stream_probe_score_increment(
            stream, weights_path, out, str(tmp_path / ckpt)
        ).awaitTermination()

    run("ckpt1")
    got = {r.vec_id: r.score_micro for r in spark.read.parquet(out).collect()}
    assert got == want
    run("ckpt2")  # replay: every id already scored -> no growth
    assert spark.read.parquet(out).count() == len(want)
