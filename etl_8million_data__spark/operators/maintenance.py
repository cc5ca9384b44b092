"""Table-maintenance operators for Parquet at scale: small-file
compaction and query-aligned clustering.

At 100 TB the two silent killers of scan performance are (a) millions
of tiny files from incremental/streaming writes — per-file open +
footer-parse overhead dwarfs the reads — and (b) row groups whose
min/max statistics span the whole key domain, so predicate pushdown
prunes nothing. ``compact_parquet`` fixes (a) by rewriting to
size-targeted files; ``clustered_write`` fixes (b) by range-partitioning
plus sorting within partitions so every file/row-group covers a tight,
disjoint slice of the clustering key (the poor man's Z-order for a
single key prefix). Both use the same rewrite-then-atomic-swap pattern
as the keyed upsert (operators/upsert.py).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _swap_in(tmp: str, path: str) -> None:
    old = f"{path}.__old__{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def parquet_data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return out


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Rewrite the table at ``path`` into ceil(total_bytes / target)
    files and atomically swap the compacted snapshot in. Returns the
    new file count. (On a cluster this is the OPTIMIZE/compaction job
    you schedule after streaming or per-batch ingest.)"""
    files = parquet_data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.__tmp__{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: compaction must not pay a shuffle —
    # it only glues input splits together.
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, path)
    return len(parquet_data_files(path))


def clustered_write(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int | None = None
) -> None:
    """Write ``df`` clustered on ``cluster_cols``: range-partition
    across files, sort within each — file- and row-group-level min/max
    on the clustering key become tight and pairwise disjoint, so a
    selective filter prunes all but the covering files at planning
    time."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
