"""applyInPandasWithState operator vs its oracle-checked batch twin."""

from __future__ import annotations

import tempfile

from etl_8million_data__spark.plans import all_queries
from etl_8million_data__spark.streaming.jobs import read_events_stream, run_available_now
from etl_8million_data__spark.streaming.stateful import user_ema_stream


def test_user_ema_stream_matches_batch(spark, sf_dir):
    with tempfile.TemporaryDirectory() as ckpt:
        stream = user_ema_stream(read_events_stream(spark, sf_dir))
        got = run_available_now(stream, "t_ema", "update", ckpt)
        # single availableNow batch -> exactly one output row per user
        stream_rows = {r.user_id: (r.n_events, r.ema_value) for r in got.collect()}
    batch = all_queries()["events_user_ema"].build(spark, sf_dir)
    batch_rows = {r.user_id: (r.n_events, r.ema_value) for r in batch.collect()}
    assert set(stream_rows) == set(batch_rows)
    for uid, (n_b, ema_b) in batch_rows.items():
        n_s, ema_s = stream_rows[uid]
        assert n_s == n_b
        assert abs(ema_s - ema_b) < 1e-9, f"user {uid}: {ema_s} vs {ema_b}"


def test_user_ema_tws_matches_batch(spark, sf_dir):
    """transformWithStateInPandas (new API, RocksDB state store) must
    produce the identical per-user fold as the old API and the batch
    oracle twin. The new API's state protocol requires the protobuf
    package; skip where it isn't installed (the old-API test above
    still covers the operator's semantics)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="declared as the 'stateful' extra in pyproject.toml; this "
        "container has no protobuf and no network to fetch it",
    )
    from etl_8million_data__spark.streaming.tws import (
        ROCKSDB_PROVIDER,
        user_ema_tws_stream,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        with tempfile.TemporaryDirectory() as ckpt:
            stream = user_ema_tws_stream(read_events_stream(spark, sf_dir))
            got = run_available_now(stream, "t_ema_tws", "update", ckpt)
            stream_rows = {r.user_id: (r.n_events, r.ema_value) for r in got.collect()}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    batch = all_queries()["events_user_ema"].build(spark, sf_dir)
    batch_rows = {r.user_id: (r.n_events, r.ema_value) for r in batch.collect()}
    assert set(stream_rows) == set(batch_rows)
    for uid, (n_b, ema_b) in batch_rows.items():
        n_s, ema_s = stream_rows[uid]
        assert n_s == n_b
        assert abs(ema_s - ema_b) < 1e-9, f"user {uid}: {ema_s} vs {ema_b}"


def _tws_ready(spark):
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="declared as the 'stateful' extra in pyproject.toml; this "
        "container has no protobuf and no network to fetch it",
    )
    from etl_8million_data__spark.streaming.tws import ROCKSDB_PROVIDER

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    return key, prev


def _tws_restore(spark, key, prev):
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_session_windows_tws_matches_batch(spark, sf_dir):
    """The transformWithState session processor (explicit state +
    event-time timers) must emit exactly the closed sessions the
    built-in session_window job emits in append mode — which is the
    batch oracle events_session_windows restricted to sessions the
    final watermark (max event time, 0s delay) has passed."""
    from pyspark.sql import functions as F

    key, prev = _tws_ready(spark)
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.streaming.tws import session_windows_tws_stream

    try:
        with tempfile.TemporaryDirectory() as ckpt:
            stream = session_windows_tws_stream(read_events_stream(spark, sf_dir))
            got = run_available_now(stream, "t_sessions_tws", "append", ckpt)
            got_rows = sorted(
                (r.user_id, r.session_start, r.session_end, r.n_events)
                for r in got.collect()
            )
    finally:
        _tws_restore(spark, key, prev)
    batch = all_queries()["events_session_windows"].build(spark, sf_dir)
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    want_rows = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.filter(F.col("session_end") <= F.lit(max_ts)).collect()
    )
    assert got_rows == want_rows
    assert got_rows


def test_contamination_guard_tws_equals_batch_and_replay_noop(spark, sf_dir, tmp_path):
    """TWS-carried idempotence: the guard's output equals the batch
    contamination filter, and a replay under the same checkpoint adds
    nothing (EmitOnceProcessor state, not a sink anti-join)."""
    from pyspark.sql import functions as F

    key, prev = _tws_ready(spark)
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.incremental_dedup import (
        build_benchmark_index,
        contamination_filter,
    )
    from etl_8million_data__spark.streaming.tws import run_contamination_guard_tws

    try:
        docs = load_table(spark, sf_dir, "documents")
        bench = docs.filter(F.col("source") == "src0")
        idx = str(tmp_path / "bench_index")
        build_benchmark_index(bench, idx)
        src = str(tmp_path / "train_src")
        docs.filter(F.col("source") != "src0").write.parquet(src)
        schema = spark.read.parquet(src).schema
        out = str(tmp_path / "clean")
        ckpt = str(tmp_path / "ckpt")

        def run():
            stream = spark.readStream.schema(schema).parquet(src)
            run_contamination_guard_tws(stream, idx, out, ckpt).awaitTermination()

        run()
        got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
        want = {
            r.doc_id
            for r in contamination_filter(
                docs.filter(F.col("source") != "src0"), idx
            ).select("doc_id").collect()
        }
        assert got == want
        run()  # same checkpoint: the batch is skipped, output unchanged
        assert spark.read.parquet(out).count() == len(want)
    finally:
        _tws_restore(spark, key, prev)
