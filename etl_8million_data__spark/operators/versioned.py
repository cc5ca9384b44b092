"""Versioned Parquet tables: snapshot commits, time travel, rollback,
vacuum — the slice of a table format (Delta/Iceberg-style) this engine
needs to make its upsert sink (operators/upsert.py, re-expressing the
reference's ON DUPLICATE KEY semantics, Financilas.py:167-184) safe for
concurrent readers and auditable over time.

Layout::

    table/
      _manifest.json          {"current": 3, "versions": {"1": {...}}}
      v00001/ v00002/ ...     immutable Parquet snapshot directories

Commit protocol (single writer, many readers):
1. write the new snapshot to the next ``vNNNNN`` directory (never
   touching any existing one);
2. atomically replace ``_manifest.json`` (``os.replace``) to point
   ``current`` at it.

A reader resolves the manifest once, then reads an immutable directory:
it sees the pre- or post-commit snapshot, never a partial one —
snapshot isolation without locks. Rollback commits a new version whose
entry *references* the old snapshot directory (no data copy), so vacuum
refcounts directories before deleting. On a real cluster the same
protocol works on any store with atomic rename (HDFS) or
put-if-absent (S3 + a commit service); multi-writer needs a lock
service or a log-structured manifest — out of scope here, as the
pipelines are single-writer per table by construction.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.upsert import last_writer_wins

_MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _load_manifest(path: str) -> dict:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return {"current": 0, "versions": {}}
    with open(mp, encoding="utf-8") as f:
        return json.load(f)


def _store_manifest(path: str, manifest: dict) -> None:
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(path))  # atomic on POSIX


def commit(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    op: str = "write",
    partition_by: list[str] | None = None,
    batch_id: int | None = None,
    query_id: str | None = None,
    extra_entry: dict | None = None,
) -> int:
    """Write ``df`` as the table's next snapshot; returns the version.

    ``batch_id`` records a streaming micro-batch id in the manifest —
    the idempotence token for foreachBatch sinks.  It is scoped to
    ``query_id`` (Delta-style ``txnAppId``): batch ids restart from 0
    for every fresh checkpoint, so a *global* high-water mark would
    silently drop the first batches of a brand-new stream writing to an
    existing table.  A replayed (query_id, batch_id) is detected by
    ``last_committed_batch`` and skipped, giving exactly-once table
    commits over Spark's at-least-once batch redelivery."""
    os.makedirs(path, exist_ok=True)
    m = _load_manifest(path)
    version = m["current"] + 1
    snap_dir = f"v{version:05d}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(path, snap_dir))
    entry = {"dir": snap_dir, "ts": time.time(), "op": op}
    if extra_entry:
        entry.update(extra_entry)
    if batch_id is not None:
        scope = query_id or "_default"
        entry["batch_id"] = batch_id
        entry["query_id"] = scope
        m.setdefault("last_batch_ids", {})[scope] = batch_id
    m["versions"][str(version)] = entry
    m["current"] = version
    _store_manifest(path, m)
    return version


def last_committed_batch(path: str, query_id: str | None = None) -> int | None:
    """Highest streaming batch_id committed *by this query* (scoped
    like Delta's txnAppId/txnVersion), or None."""
    return _load_manifest(path).get("last_batch_ids", {}).get(query_id or "_default")


def read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``version``."""
    m = _load_manifest(path)
    v = m["current"] if version is None else version
    entry = m["versions"].get(str(v))
    if entry is None:
        raise ValueError(f"{path}: no version {v} (current={m['current']})")
    return spark.read.parquet(os.path.join(path, entry["dir"]))


def versions(path: str) -> list[dict]:
    """Commit history, oldest first: [{version, dir, ts, op}, ...]."""
    m = _load_manifest(path)
    return [
        {"version": int(k), **v}
        for k, v in sorted(m["versions"].items(), key=lambda kv: int(kv[0]))
    ]


def rollback(path: str, to_version: int) -> int:
    """Commit a new version pointing at an old snapshot's data (no
    copy); the rolled-back-from version stays in history."""
    m = _load_manifest(path)
    entry = m["versions"].get(str(to_version))
    if entry is None:
        raise ValueError(f"{path}: no version {to_version}")
    version = m["current"] + 1
    m["versions"][str(version)] = {
        "dir": entry["dir"],
        "ts": time.time(),
        "op": f"rollback->{to_version}",
    }
    m["current"] = version
    _store_manifest(path, m)
    return version


def vacuum(path: str, keep_last: int = 1, retention_s: float = 0.0) -> list[int]:
    """Drop all but the last ``keep_last`` versions from history and
    delete snapshot directories no surviving version references (a
    rollback target shared with a kept version survives). Returns the
    dropped version numbers.

    ``retention_s`` is the reader-protection window (Delta/Iceberg
    retention semantics): versions committed within the last
    ``retention_s`` seconds are kept even beyond ``keep_last``, so a
    reader pinned to a recent snapshot cannot have its files deleted
    mid-scan. The default of 0 deletes eagerly and is only safe when
    readers are quiesced — production callers should pass a window
    larger than their longest-running read."""
    m = _load_manifest(path)
    keep_last = max(keep_last, 1)
    now = time.time()
    ordered = sorted(int(k) for k in m["versions"])
    candidates = ordered[:-keep_last]
    dropped = [
        v
        for v in candidates
        if now - m["versions"][str(v)].get("ts", now) >= retention_s
    ]
    kept = [v for v in ordered if v not in set(dropped)]
    kept_dirs = {m["versions"][str(v)]["dir"] for v in kept}
    for v in dropped:
        d = m["versions"].pop(str(v))["dir"]
        if d not in kept_dirs and os.path.exists(os.path.join(path, d)):
            shutil.rmtree(os.path.join(path, d))
    _store_manifest(path, m)
    return dropped


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
    partition_by: list[str] | None = None,
    batch_id: int | None = None,
    query_id: str | None = None,
) -> int:
    """Last-writer-wins merge committed as a new snapshot (the
    versioned twin of operators/upsert.upsert_parquet): read current,
    union, window-dedup per key, commit. Returns the new version."""
    m = _load_manifest(path) if os.path.exists(path) else {"current": 0}
    if m["current"]:
        merged = read(spark, path).unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    deduped = last_writer_wins(merged, keys, order_col, tiebreak)
    return commit(
        spark,
        deduped,
        path,
        op="upsert",
        partition_by=partition_by,
        batch_id=batch_id,
        query_id=query_id,
    )


def commit_bucketed(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    nb: int = 16,
    op: str = "write",
    batch_id: int | None = None,
    query_id: str | None = None,
) -> int:
    """Commit ``df`` as a ``kb=``-bucketed snapshot whose per-bucket
    (checksum, count) summary rides IN THE MANIFEST ENTRY — the
    version-level form of operators/diff.py's persisted summaries:
    once two versions both carry summaries, :func:`table_changes_pruned`
    resolves their differing buckets from MANIFEST METADATA ALONE
    (zero data reads for phase 1) and full-outer joins only those
    buckets' rows, so CDC between adjacent versions of a 100 TB table
    with 0.1% churn reads ~0.1% of it (bucket granularity).

    The summary is one map-side aggregate over the bucketed frame the
    write just materialized (lazy checkpoint: the write is the
    materializer, the aggregate reuses it — never a re-read of the
    source), stored as [[kb, checksum_str, n], ...] with the
    fingerprinted (keys, cols, nb) pin; a pin mismatch between two
    versions (schema change) falls back to the full-join CDC."""
    from etl_8million_data__spark.operators.diff import _bucket_sums
    from etl_8million_data__spark.operators.partitioning import id_bucket

    cols = sorted(c for c in df.columns if c != key)
    staged = df.withColumn("kb", id_bucket(F.col(key), nb)).repartition(
        F.col("kb")
    ).localCheckpoint(eager=False)
    version = commit(
        spark,
        staged,
        path,
        op=op,
        partition_by=["kb"],
        batch_id=batch_id,
        query_id=query_id,
    )
    summ = _bucket_sums(staged, [key], cols).collect()
    m = _load_manifest(path)
    m["versions"][str(version)]["checksums"] = {
        "keys": [key],
        "cols": cols,
        "nb": nb,
        "rows": [[r["kb"], str(r["cs"]), r["n"]] for r in summ],
    }
    # the declared schema rides along so pruned readers plan with ZERO
    # footer inference (the bucket_store.read_store discipline — plain
    # inference was measured reading EVERY file's footer in parallel)
    m["versions"][str(version)]["schema_json"] = staged.schema.json()
    _store_manifest(path, m)
    return version


def table_changes_pruned(
    spark: SparkSession,
    path: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
    include_version: bool = False,
) -> DataFrame:
    """CDC read accelerated by the manifest summaries
    (:func:`commit_bucketed`): the differing-bucket set is computed by
    comparing the two versions' stored checksum rows — pure driver
    metadata, no table scan — and ONLY those buckets' rows full-outer
    join for classification (identical output contract to
    :func:`table_changes`, asserted in tests). Versions without
    matching summary pins fall back to the full-join CDC, never a
    wrong answer. ``include_version=True`` adds ``_commit_version`` =
    the to-version — the column that makes the downstream apply
    (operators/diff.apply_changes_versioned) safe under out-of-order
    redelivery."""
    m = _load_manifest(path)
    v2 = m["current"] if to_version is None else to_version
    e1 = m["versions"].get(str(from_version)) or {}
    e2 = m["versions"].get(str(v2)) or {}
    ck1, ck2 = e1.get("checksums"), e2.get("checksums")
    if not (
        ck1
        and ck2
        and ck1["keys"] == list(keys)
        and ck1["keys"] == ck2["keys"]
        and ck1["cols"] == ck2["cols"]
        and ck1["nb"] == ck2["nb"]
    ):
        return table_changes(
            spark, path, keys, from_version, v2, include_version
        )
    s1 = {r[0]: (r[1], r[2]) for r in ck1["rows"]}
    s2 = {r[0]: (r[1], r[2]) for r in ck2["rows"]}
    diff_kbs = [
        kb
        for kb in set(s1) | set(s2)
        if s1.get(kb) != s2.get(kb)
    ]
    def _read_decl(entry, version):
        sj = entry.get("schema_json")
        if not sj:
            return read(spark, path, version=version)
        from pyspark.sql.types import StructType

        return spark.read.schema(
            StructType.fromJson(json.loads(sj))
        ).parquet(os.path.join(path, entry["dir"]))

    before = _read_decl(e1, from_version)
    after = _read_decl(e2, v2)
    if diff_kbs:
        before = before.filter(F.col("kb").isin(diff_kbs))
        after = after.filter(F.col("kb").isin(diff_kbs))
    else:
        before, after = before.filter(F.lit(False)), after.filter(F.lit(False))
    out = _classify_changes(before.drop("kb"), after.drop("kb"), keys)
    if include_version:
        out = out.withColumn("_commit_version", F.lit(v2).cast("bigint"))
    return out


def table_changes(
    spark: SparkSession,
    path: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
    include_version: bool = False,
) -> DataFrame:
    """Row-level diff between two snapshots (CDC read): one row per
    changed key with ``_change_type`` in insert / update / delete and
    the *post-image* values (pre-image for deletes). Computed as a full
    outer join of the two immutable snapshots on the key — at scale
    both sides are partition-pruned Parquet scans and the join shuffles
    on the key only; for tables with a recency column an incremental
    log would be cheaper, but a diff of snapshots is always available
    and needs no write-path cooperation. A bucketed snapshot's ``kb``
    partition column is excluded from the output (it is a pure function
    of the key, and the pruned path never emits it — both paths share
    one output contract). ``include_version=True`` adds
    ``_commit_version`` = the resolved to-version."""
    m = _load_manifest(path)
    v2 = m["current"] if to_version is None else to_version
    before = read(spark, path, version=from_version)
    after = read(spark, path, version=v2)
    # the bucket column is derived layout metadata, not a value column:
    # emitting it from one path and not the other would give callers a
    # schema that depends on whether the summary pins matched
    if "kb" in before.columns:
        before = before.drop("kb")
    if "kb" in after.columns:
        after = after.drop("kb")
    out = _classify_changes(before, after, keys)
    if include_version:
        out = out.withColumn("_commit_version", F.lit(v2).cast("bigint"))
    return out


def _classify_changes(
    before: DataFrame, after: DataFrame, keys: list[str]
) -> DataFrame:
    val_cols = [c for c in after.columns if c not in keys]
    # a source schema evolution between the two versions widens the
    # after-image: NULL-extend the before-image for the new columns
    # (the bucket_store.evolve_add_columns read-back semantics), so the
    # CDC across the evolution boundary classifies correctly — a row
    # whose evolved column is NULL on both sides is unchanged, one that
    # gained a value is an update carrying it
    after_types = {f.name: f.dataType for f in after.schema.fields}
    missing = [c for c in val_cols if c not in before.columns]
    if missing:
        before = before.select(
            "*",
            *[F.lit(None).cast(after_types[c]).alias(c) for c in missing],
        )
    b = before.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in val_cols],
    )
    a = after.select(
        *[F.col(k).alias(f"_a_{k}") for k in keys],
        *[F.col(c).alias(f"_a_{c}") for c in val_cols],
    )
    cond = None
    for k in keys:
        eq = F.col(f"_b_{k}") == F.col(f"_a_{k}")
        cond = eq if cond is None else (cond & eq)
    j = b.join(a, cond, "full_outer")
    in_after = F.col(f"_a_{keys[0]}").isNotNull()
    in_before = F.col(f"_b_{keys[0]}").isNotNull()
    changed = None
    for c in val_cols:
        ne = ~F.col(f"_b_{c}").eqNullSafe(F.col(f"_a_{c}"))
        changed = ne if changed is None else (changed | ne)
    change_type = (
        F.when(in_after & ~in_before, F.lit("insert"))
        .when(~in_after & in_before, F.lit("delete"))
        .when(changed if changed is not None else F.lit(False), F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"_a_{k}"), F.col(f"_b_{k}")).alias(k) for k in keys
    ]
    out_vals = [
        F.when(in_after, F.col(f"_a_{c}")).otherwise(F.col(f"_b_{c}")).alias(c)
        for c in val_cols
    ]
    return (
        j.withColumn("_change_type", change_type)
        .filter(F.col("_change_type").isNotNull())
        .select("_change_type", *out_keys, *out_vals)
    )


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    partition_by: list[str] | None = None,
    batch_id: int | None = None,
    query_id: str | None = None,
) -> int:
    """Targeted row erasure (GDPR/CCPA delete) as a snapshot commit:
    the new snapshot contains every current row EXCEPT those matching
    ``predicate`` (a boolean Column over the table's schema).  Rows
    where the predicate evaluates NULL are KEPT — a delete must only
    remove rows provably matching the request, mirroring SQL DELETE
    semantics.

    Erasure is LOGICAL immediately (every new reader resolves the
    manifest to the new snapshot) and PHYSICAL once
    ``vacuum(path, keep_last=1)`` drops the older snapshot directories
    that still contain the rows — the same two-step contract as
    Delta/Iceberg, where time travel and instant hard-erasure are
    fundamentally at odds; callers with a deletion SLA schedule the
    vacuum.  Returns the new version.  The rewrite cost is one scan +
    write of the CURRENT snapshot only; with ``partition_by`` on the
    predicate's column, unaffected partitions could be hard-linked
    rather than rewritten — kept simple here because snapshots are
    already directory-immutable."""
    kept = read(spark, path).filter(
        F.coalesce(~predicate, F.lit(True))
    )
    return commit(
        spark,
        kept,
        path,
        op="delete",
        partition_by=partition_by,
        batch_id=batch_id,
        query_id=query_id,
    )
