"""Streaming CDC producer — the SEND side of continuous replication,
closing the loop the apply side (operators/diff.stream_apply_changes)
already runs: a versioned table's commits (operators/versioned.py) are
tailed into a FILE-BASED CHANGE LOG that Spark's file stream source
consumes, so the whole replicate-apply-verify pipeline is continuous
end to end:

    commits on A  ->  publish_changes (tail new versions into the log)
                  ->  changes_stream (readStream over the log)
                  ->  stream_apply_changes on replica B (versioned,
                      max-version-wins — safe under redelivery AND
                      reordering)
                  ->  summarized diff_tables audit (2 x nb rows)

Each published version becomes one parquet batch directory of change
rows carrying ``_commit_version`` (table_changes_pruned with
``include_version=True`` — on manifest-summarized tables the change
computation reads only the differing buckets, phase 1 from driver
metadata alone). A ``_published`` watermark sidecar makes the producer
resumable and idempotent: re-running publishes nothing new, and a
producer crash mid-version re-publishes that version's frame whole
(same deterministic rows — the versioned apply converges regardless).

Zero-change versions still advance the watermark (nothing to ship).
At 100 TB the log is a bounded stream of drift-sized frames; the file
source's own checkpointing gives the consumer exactly-once batch
tracking on top of the apply door's convergence.

Reference semantics: the reference reloads tables wholesale and
validates by row counts (details.py's read-back counting); this is the
continuous content-level replication upgrade, SURVEY §7.2's
ops-extension brief.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_WATERMARK = "_published.json"


def _read_watermark(log_dir: str) -> int:
    p = os.path.join(log_dir, _WATERMARK)
    try:
        with open(p) as fh:
            return int(json.load(fh)["upto"])
    except (OSError, ValueError, KeyError):
        return 0


def _write_watermark(log_dir: str, upto: int) -> None:
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, _WATERMARK + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"upto": upto}, fh)
    os.replace(tmp, os.path.join(log_dir, _WATERMARK))


def publish_changes(
    spark: SparkSession,
    table_path: str,
    log_dir: str,
    keys: list[str],
    from_version: int | None = None,
) -> int:
    """Tail the versioned table's commits into the change log: every
    version AFTER the published watermark (or ``from_version`` when the
    log is fresh — the replica's seed version) ships one batch of
    ``table_changes_pruned(v-1, v, include_version=True)`` rows under
    ``log_dir/data/``. Returns the number of versions published.

    Idempotent and resumable: the watermark advances only after a
    version's frame is fully written, so a crash re-publishes that one
    version whole — duplicate frames are harmless downstream because
    the versioned apply is max-version-wins. Cost per version is the
    metadata-pruned CDC (differing buckets only); a version with zero
    changes writes nothing and still advances the watermark."""
    from etl_8million_data__spark.operators.versioned import (
        _load_manifest,
        table_changes_pruned,
    )

    current = _load_manifest(table_path)["current"]
    last = _read_watermark(log_dir)
    if last == 0 and from_version is not None:
        last = from_version
        _write_watermark(log_dir, last)
    data_dir = os.path.join(log_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    published = 0
    for v in range(last + 1, current + 1):
        ch = table_changes_pruned(
            spark, table_path, keys, v - 1, v, include_version=True
        )
        # NO coalesce(1): a high-drift version's frame must not funnel
        # through a single task — multiple files per version are fine
        # (the versioned apply converges under ANY batch grouping, the
        # property-tested max-version-wins guarantee), and the file
        # source delivers them in whatever micro-batches it forms
        ch.write.mode("append").parquet(data_dir)
        _write_watermark(log_dir, v)
        published += 1
    return published


def changes_stream(spark: SparkSession, log_dir: str) -> DataFrame:
    """The consumer half: a file-source stream over the published log.
    The schema comes from the log's first published frame (file sources
    need a declared schema; the change-frame shape is stable per table:
    _change_type, keys, value columns, _commit_version). Feed this to
    operators/diff.stream_apply_changes — the ``_commit_version``
    column routes it to the max-version-wins apply."""
    data_dir = os.path.join(log_dir, "data")
    has_frames = os.path.isdir(data_dir) and any(
        f.endswith(".parquet") for f in os.listdir(data_dir)
    )
    if not has_frames:
        raise ValueError(
            f"{log_dir}: no published change frames yet — run "
            "publish_changes first so the consumer can derive the "
            "change-frame schema (file sources need a declared schema)"
        )
    schema = spark.read.parquet(data_dir).schema
    return spark.readStream.schema(schema).parquet(data_dir)
