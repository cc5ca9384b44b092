"""Versioned-table operator: snapshot isolation, time travel, rollback,
refcounted vacuum (operators/versioned.py)."""

from __future__ import annotations

import os
import tempfile

import pytest

from etl_8million_data__spark.operators import versioned as V


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "t")


def _rows(spark, data):
    return spark.createDataFrame(data, "k string, v int, ts int")


def test_commit_read_and_time_travel(spark, table):
    v1 = V.commit(spark, _rows(spark, [("a", 1, 1), ("b", 2, 1)]), table)
    v2 = V.upsert(
        spark, _rows(spark, [("b", 20, 2), ("c", 30, 2)]), table, ["k"], "ts"
    )
    assert (v1, v2) == (1, 2)
    latest = {r.k: r.v for r in V.read(spark, table).collect()}
    assert latest == {"a": 1, "b": 20, "c": 30}
    # time travel: version 1 unchanged by the upsert
    old = {r.k: r.v for r in V.read(spark, table, version=1).collect()}
    assert old == {"a": 1, "b": 2}
    ops = [e["op"] for e in V.versions(table)]
    assert ops == ["write", "upsert"]


def test_reader_snapshot_isolation(spark, table):
    V.commit(spark, _rows(spark, [("a", 1, 1)]), table)
    handle = V.read(spark, table)  # lazy plan pinned to the v1 directory
    V.commit(spark, _rows(spark, [("a", 999, 2)]), table)
    # the in-flight reader still sees its snapshot, post-commit readers the new one
    assert [r.v for r in handle.collect()] == [1]
    assert [r.v for r in V.read(spark, table).collect()] == [999]


def test_rollback_is_a_new_version_without_copy(spark, table):
    V.commit(spark, _rows(spark, [("a", 1, 1)]), table)
    V.commit(spark, _rows(spark, [("a", 2, 2)]), table)
    v3 = V.rollback(table, to_version=1)
    assert v3 == 3
    assert [r.v for r in V.read(spark, table).collect()] == [1]
    vs = {e["version"]: e["dir"] for e in V.versions(table)}
    assert vs[3] == vs[1]  # shared data directory, no copy


def test_vacuum_refcounts_shared_dirs(spark, table):
    V.commit(spark, _rows(spark, [("a", 1, 1)]), table)
    V.commit(spark, _rows(spark, [("a", 2, 2)]), table)
    V.rollback(table, to_version=1)  # v3 -> v1's dir
    dropped = V.vacuum(table, keep_last=1)
    assert dropped == [1, 2]
    # v1's dir survives (referenced by kept v3); v2's dir is deleted
    assert os.path.isdir(os.path.join(table, "v00001"))
    assert not os.path.exists(os.path.join(table, "v00002"))
    assert [r.v for r in V.read(spark, table).collect()] == [1]
    with pytest.raises(ValueError):
        V.read(spark, table, version=2)


def test_upsert_on_empty_table_bootstraps(spark, table):
    v = V.upsert(spark, _rows(spark, [("x", 7, 1)]), table, ["k"], "ts")
    assert v == 1
    assert [r.v for r in V.read(spark, table).collect()] == [7]


def test_table_changes_cdc_diff(spark, table):
    V.commit(spark, _rows(spark, [("a", 1, 1), ("b", 2, 1), ("d", 4, 1)]), table)
    # v2: b updated, c inserted, d deleted (upsert can't delete -> commit)
    V.commit(spark, _rows(spark, [("a", 1, 1), ("b", 20, 2), ("c", 30, 2)]), table)
    changes = {
        r.k: (r._change_type, r.v)
        for r in V.table_changes(spark, table, ["k"], from_version=1).collect()
    }
    # unchanged key 'a' is absent; post-image for insert/update, pre-image for delete
    assert changes == {
        "b": ("update", 20),
        "c": ("insert", 30),
        "d": ("delete", 4),
    }


def test_stream_upsert_versioned_exactly_once(spark, sf_dir, table, tmp_path):
    """Replay protection is scoped to the stream (checkpoint) like
    Delta's txnAppId: a redelivered (query, batch) is skipped, but a
    *new* stream with a fresh checkpoint — whose batch ids restart at
    0 — must NOT be dropped by another stream's high-water mark."""
    from etl_8million_data__spark.streaming.jobs import (
        read_events_stream,
        stream_upsert_versioned,
    )

    def run_once(ckpt):
        q = stream_upsert_versioned(
            read_events_stream(spark, sf_dir),
            table,
            keys=["user_id", "event_type"],
            order_col="ts",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()

    ckpt1 = str(tmp_path / "ckpt1")
    run_once(ckpt1)
    n_rows = V.read(spark, table).count()
    assert len(V.versions(table)) == 1 and n_rows > 0

    # same checkpoint restarted: source + manifest both say nothing new
    run_once(ckpt1)
    assert len(V.versions(table)) == 1
    assert V.read(spark, table).count() == n_rows

    # a brand-new stream (fresh checkpoint, batch ids restart at 0) IS
    # applied — its data must not be silently dropped; the idempotent
    # upsert leaves identical rows but commits a new version
    run_once(str(tmp_path / "ckpt2"))
    assert len(V.versions(table)) == 2
    assert V.read(spark, table).count() == n_rows


def test_batch_token_scoped_per_query(spark, table):
    """Manifest batch tokens are (query_id, batch_id) pairs, not a
    global high-water mark."""
    V.commit(spark, _rows(spark, [("a", 1, 1)]), table, batch_id=5, query_id="q1")
    assert V.last_committed_batch(table, query_id="q1") == 5
    assert V.last_committed_batch(table, query_id="q2") is None
    assert V.last_committed_batch(table) is None  # unscoped default bucket
    V.commit(spark, _rows(spark, [("b", 2, 1)]), table, batch_id=0, query_id="q2")
    assert V.last_committed_batch(table, query_id="q1") == 5
    assert V.last_committed_batch(table, query_id="q2") == 0


def test_vacuum_retention_protects_recent_versions(spark, table):
    """Versions committed inside the retention window survive vacuum
    even beyond keep_last, so a reader pinned to a recent snapshot
    cannot lose its files mid-scan."""
    V.commit(spark, _rows(spark, [("a", 1, 1)]), table)
    V.commit(spark, _rows(spark, [("a", 2, 2)]), table)
    V.commit(spark, _rows(spark, [("a", 3, 3)]), table)
    # everything was committed "just now": a 1-hour retention keeps all
    assert V.vacuum(table, keep_last=1, retention_s=3600) == []
    assert os.path.isdir(os.path.join(table, "v00001"))
    # retention 0 (explicit eager mode) drops the old ones
    assert V.vacuum(table, keep_last=1, retention_s=0) == [1, 2]
    assert not os.path.exists(os.path.join(table, "v00001"))


def test_delete_where_erasure_contract(spark, table):
    from pyspark.sql import functions as F

    V.commit(
        spark,
        _rows(spark, [("a", 1, 1), ("b", 2, 1), ("c", None, 1)]),
        table,
    )
    v2 = V.delete_where(spark, table, F.col("k") == "a")
    assert v2 == 2
    # logical erasure: gone for new readers...
    left = {r.k for r in V.read(spark, table).collect()}
    assert left == {"b", "c"}
    # ...NULL-predicate rows kept (SQL DELETE semantics: v is NULL for
    # 'c', so v > 0 is NULL -> not provably matching -> keep)
    V.delete_where(spark, table, F.col("v") > 0)
    assert {r.k for r in V.read(spark, table).collect()} == {"c"}
    # CDC sees the delete
    ch = {
        (r.k, r._change_type)
        for r in V.table_changes(spark, table, ["k"], 1, 2).collect()
    }
    assert ("a", "delete") in ch
    # time travel still exposes the deleted row until vacuum...
    assert {r.k for r in V.read(spark, table, version=1).collect()} == {"a", "b", "c"}
    # ...and vacuum completes PHYSICAL erasure
    removed = V.vacuum(table, keep_last=1)
    assert removed
    with pytest.raises(Exception):
        V.read(spark, table, version=1).collect()


def test_table_changes_pruned_equals_full_and_skips_clean_buckets(
    spark, sf_dir, table
):
    """Manifest-summary CDC: with both versions committed through
    commit_bucketed, the differing-bucket set comes from manifest
    metadata alone and only those buckets' rows join — proven
    physically by a garbage parquet file planted in a NON-differing
    bucket of BOTH snapshots (the full-join CDC must fail on it; the
    pruned CDC must not notice), with the output contract identical to
    table_changes across all three change classes."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table

    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_custkey").alias("cust"),
        )
        .localCheckpoint(eager=True)
    )
    v1 = V.commit_bucketed(spark, o, table, "k")
    # single-key edit so most buckets are provably clean
    victim = o.orderBy("k").first()["k"]
    o2 = o.withColumn(
        "prio",
        F.when(F.col("k") == victim, F.lit("X-EDITED")).otherwise(F.col("prio")),
    )
    v2 = V.commit_bucketed(spark, o2, table, "k")

    got = {
        tuple(r)
        for r in V.table_changes_pruned(spark, table, ["k"], v1, v2).collect()
    }
    assert got == {("update", victim, "X-EDITED",
                    o.filter(F.col("k") == victim).first()["cust"])}

    # all three change classes, pruned == full
    o3 = (
        o2.filter(F.col("k") % 13 != 0)
        .unionByName(
            o2.filter(F.col("k") % 11 == 0).select(
                (-(F.col("k") + 1)).alias("k"), "prio", "cust"
            )
        )
        .withColumn(
            "cust",
            F.when(F.col("k") % 7 == 0, F.col("cust") + 1).otherwise(
                F.col("cust")
            ),
        )
    )
    v3 = V.commit_bucketed(spark, o3, table, "k", op="upsert")
    # both CDC paths share one output contract: the bucket column never
    # appears (it is derived layout metadata, not a value column)
    full_df = V.table_changes(spark, table, ["k"], v2, v3)
    pruned_df = V.table_changes_pruned(spark, table, ["k"], v2, v3)
    assert full_df.columns == pruned_df.columns
    assert "kb" not in full_df.columns
    full = {tuple(r) for r in full_df.collect()}
    pruned = {tuple(r) for r in pruned_df.collect()}
    assert pruned == full
    assert {t[0] for t in pruned} == {"insert", "update", "delete"}

    # include_version stamps the to-version on both paths identically
    fv = V.table_changes(spark, table, ["k"], v2, v3, include_version=True)
    pv = V.table_changes_pruned(
        spark, table, ["k"], v2, v3, include_version=True
    )
    assert fv.columns == pv.columns
    assert {r["_commit_version"] for r in pv.collect()} == {v3}
    assert {tuple(r) for r in fv.collect()} == {tuple(r) for r in pv.collect()}

    # physical proof on the single-edit pair: garbage in a clean bucket
    import os

    from etl_8million_data__spark.operators.partitioning import id_bucket

    victim_kb = o.filter(F.col("k") == victim).select(
        id_bucket(F.col("k"), 16).alias("b")
    ).first()["b"]
    for ver_dir in ("v00001", "v00002"):
        clean = next(
            d
            for d in os.listdir(os.path.join(table, ver_dir))
            if d.startswith("kb=") and int(d.split("=")[1]) != victim_kb
        )
        with open(
            os.path.join(table, ver_dir, clean, "junk.parquet"), "wb"
        ) as fh:
            fh.write(b"not parquet")
    spark.catalog.refreshByPath(table)
    import pytest as _pt

    with _pt.raises(Exception):
        V.table_changes(spark, table, ["k"], v1, v2).collect()
    got2 = {
        tuple(r)
        for r in V.table_changes_pruned(spark, table, ["k"], v1, v2).collect()
    }
    assert {t[:2] for t in got2} == {("update", victim)}

    # identical versions: metadata alone proves no change (reads nothing)
    assert V.table_changes_pruned(spark, table, ["k"], v1, v1).count() == 0


def test_table_changes_pruned_falls_back_without_summaries(spark, table):
    v1 = V.commit(spark, _rows(spark, [("a", 1, 1), ("b", 2, 1)]), table)
    v2 = V.commit(spark, _rows(spark, [("a", 1, 1), ("b", 3, 2)]), table)
    got = {
        (r["_change_type"], r["k"])
        for r in V.table_changes_pruned(spark, table, ["k"], v1, v2).collect()
    }
    assert got == {("update", "b")}


def test_apply_changes_converges_replica_and_is_reapply_safe(
    spark, sf_dir, table, tmp_path
):
    """apply_changes must converge a v1 replica to v2 across all three
    change classes touching ONLY the changed keys' buckets, keep the
    replica's summary honest, and tolerate a re-applied change frame
    (upserts converge, deletes miss)."""
    import os

    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.diff import (
        apply_changes,
        checksums_fsck,
        diff_tables,
        write_bucketed,
    )

    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_custkey").alias("cust"),
        )
        .localCheckpoint(eager=True)
    )
    b = (
        o.filter(F.col("k") % 13 != 0)
        .withColumn(
            "prio",
            F.when(F.col("k") % 7 == 0, F.lit("Z")).otherwise(F.col("prio")),
        )
        .unionByName(
            o.filter(F.col("k") % 11 == 0).select(
                (-(F.col("k") + 1)).alias("k"), "prio", "cust"
            )
        )
    )
    v1 = V.commit_bucketed(spark, o, table, "k")
    v2 = V.commit_bucketed(spark, b, table, "k", op="upsert")
    ch = V.table_changes_pruned(spark, table, ["k"], v1, v2).localCheckpoint(
        eager=True
    )
    assert {r["_change_type"] for r in ch.select("_change_type").distinct().collect()} == {
        "insert", "update", "delete",
    }

    replica = str(tmp_path / "replica")
    write_bucketed(o, replica, "k", checksums=True)

    def snap():
        out = {}
        for dirpath, _, files in os.walk(replica):
            if "_checksums" in dirpath:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    with open(p, "rb") as fh:
                        out[os.path.relpath(p, replica)] = fh.read()
        return out

    before = snap()
    n = apply_changes(spark, replica, ch, "k")
    assert n == ch.count()
    # only changed keys' buckets rewrote
    from etl_8million_data__spark.operators.partitioning import id_bucket

    touched = {
        r["_b"]
        for r in ch.select(id_bucket(F.col("k"), 16).alias("_b"))
        .distinct()
        .collect()
    }
    after = snap()
    changed = {
        rel.split(os.sep)[0]
        for rel in set(before) | set(after)
        if before.get(rel) != after.get(rel)
    }
    assert changed <= {f"kb={b_}" for b_ in touched}, (changed, touched)

    expected = str(tmp_path / "expected")
    write_bucketed(b, expected, "k", checksums=True)
    assert diff_tables(spark, replica, expected, ["k"], ["prio", "cust"]).count() == 0
    assert checksums_fsck(spark, replica).first()["n_mismatched"] == 0

    # re-applying the same change frame converges to the same state
    apply_changes(spark, replica, ch, "k")
    assert diff_tables(spark, replica, expected, ["k"], ["prio", "cust"]).count() == 0
    assert checksums_fsck(spark, replica).first()["n_mismatched"] == 0


def test_stream_apply_changes_equals_batch_and_replays(
    spark, sf_dir, table, tmp_path
):
    """Streaming CDC apply: the replica converges to v2 however the
    change frame is micro-batched, a full redelivery under a fresh
    checkpoint changes nothing (convergence idempotence), and the
    summary stays fsck-clean."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.diff import (
        checksums_fsck,
        diff_tables,
        stream_apply_changes,
        write_bucketed,
    )

    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_custkey").alias("cust"),
        )
        .localCheckpoint(eager=True)
    )
    b = (
        o.filter(F.col("k") % 13 != 0)
        .withColumn(
            "prio",
            F.when(F.col("k") % 7 == 0, F.lit("Z")).otherwise(F.col("prio")),
        )
        .unionByName(
            o.filter(F.col("k") % 11 == 0).select(
                (-(F.col("k") + 1)).alias("k"), "prio", "cust"
            )
        )
    )
    v1 = V.commit_bucketed(spark, o, table, "k")
    v2 = V.commit_bucketed(spark, b, table, "k", op="upsert")
    ch = V.table_changes_pruned(spark, table, ["k"], v1, v2)

    src = str(tmp_path / "changes")
    ch.write.parquet(src)
    replica = str(tmp_path / "replica")
    write_bucketed(o, replica, "k", checksums=True)

    def run(ck):
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).option("maxFilesPerTrigger", 2).parquet(src)
        q = stream_apply_changes(stream, replica, "k", str(tmp_path / ck))
        q.awaitTermination(180)

    run("ck1")
    expected = str(tmp_path / "expected")
    write_bucketed(b, expected, "k", checksums=True)
    assert diff_tables(spark, replica, expected, ["k"], ["prio", "cust"]).count() == 0
    assert checksums_fsck(spark, replica).first()["n_mismatched"] == 0

    # full redelivery under a fresh checkpoint: converges to the same
    run("ck2")
    assert diff_tables(spark, replica, expected, ["k"], ["prio", "cust"]).count() == 0
    assert checksums_fsck(spark, replica).first()["n_mismatched"] == 0
