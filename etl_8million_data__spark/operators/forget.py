"""Deletion propagation for persisted derived state — the
right-to-be-forgotten path of a training-data store: removing a
document from the corpus is not enough; its vectors sit in ANN index
cells, its bands in the dedup index, its fingerprints in the winnowing
index, and any of those can resurface it (an ANN probe returns its
vec_id; the dedup index suppresses a future legitimate copy by matching
a ghost). These operators delete ids from each persisted layout with
the minimum rewrite the layout allows:

- **Cell-partitioned indexes** (SRP/int8/kmeans ``cell=``-partitioned
  vectors, IVF-PQ ``codes/``): a column-pruned (id, cell) lookup finds
  the touched cells, ONLY those partitions rewrite via dynamic
  partition overwrite, and a cell whose every row is deleted has its
  directory dropped explicitly (dynamic overwrite cannot rewrite a
  partition it receives no rows for). Untouched cells' files are never
  read past the id column and never written — byte-identity asserted in
  tests. O(touched cells) per forget batch, the same blast-radius
  contract as the partitioned upsert.
- **Unpartitioned indexes** (sign signatures, LSH band index, winnowing
  fingerprints): filter + atomic tmp-dir swap — these layouts have no
  partition key to prune on, and their rows are tens of bytes, so a
  full rewrite is the honest cost (at 100 TB you would partition them
  by an id bucket exactly like the financials fact's stock_bucket).

``compact_cells`` is the companion maintenance op: per-batch appends
leave one small file per cell per batch; compaction rewrites each
populated cell into its minimal file set (probe results are identical
before/after — asserted in tests), which is what keeps probe
file-listing cost flat as append batches accumulate.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ids_frame(ids: DataFrame, id_col: str) -> DataFrame:
    return ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()


def forget_cell_partitioned(
    spark: SparkSession,
    index_path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> int:
    """Delete ``ids`` from a ``cell=``-partitioned index, rewriting only
    the cells that contain them. Returns rows removed (0 when no id is
    present — a re-forget is a no-op, same idempotence contract as the
    skip-existing appends)."""
    victims = _ids_frame(ids, id_col)
    # column-pruned lookup: parquet reads only (id, cell)
    located = (
        spark.read.parquet(index_path)
        .select(id_col, "cell")
        .join(victims, id_col)
    )
    touched = [r["cell"] for r in located.select("cell").distinct().collect()]
    if not touched:
        return 0
    relevant = spark.read.parquet(index_path).filter(F.col("cell").isin(touched))
    kept = relevant.join(victims, id_col, "left_anti").localCheckpoint(eager=True)
    n_deleted = relevant.count() - kept.count()
    surviving = {r["cell"] for r in kept.select("cell").distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if surviving:
            kept.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # cells emptied outright: dynamic overwrite received no rows for
    # them, so their directories (and the ghost rows inside) remain —
    # drop them explicitly
    for cell in set(touched) - surviving:
        d = os.path.join(index_path, f"cell={cell}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    return n_deleted


def forget_unpartitioned(
    spark: SparkSession,
    index_path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> int:
    """Delete ``ids`` from an unpartitioned index by filter + atomic
    swap (same swap discipline as the unpartitioned upsert). Returns
    rows removed; a miss is a no-op that never rewrites."""
    victims = _ids_frame(ids, id_col)
    idx = spark.read.option("mergeSchema", "true").parquet(index_path)
    n_hit = idx.select(id_col).join(victims, id_col).count()
    if not n_hit:
        return 0
    kept = idx.join(victims, id_col, "left_anti").localCheckpoint(eager=True)
    tmp = f"{index_path}.__tmp__{uuid.uuid4().hex[:8]}"
    kept.write.mode("overwrite").parquet(tmp)
    old = f"{index_path}.__old__{uuid.uuid4().hex[:8]}"
    os.rename(index_path, old)
    os.rename(tmp, index_path)
    shutil.rmtree(old)
    return n_hit


def forget_ivfpq(spark: SparkSession, index_path: str, ids: DataFrame) -> int:
    """Delete vectors from an IVF-PQ index (codes live under
    ``codes/``; centroids/codebook are AGGREGATE model state, not
    per-row data, so they are untouched — a deleted vector leaves no
    recoverable trace in k-means cell means or codebook centroids)."""
    return forget_cell_partitioned(
        spark, os.path.join(index_path, "codes"), ids, "vec_id"
    )


def compact_cells(spark: SparkSession, index_path: str) -> tuple[int, int]:
    """Rewrite every populated cell of a ``cell=``-partitioned index
    into its minimal file set (AQE REBALANCE by the partition column —
    oversized cells still split to advisory size instead of one giant
    file). Returns (files_before, files_after). Row content is
    untouched: probes return identical results before and after
    (asserted in tests)."""

    def _count_files() -> int:
        n = 0
        for dirpath, _, files in os.walk(index_path):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    before = _count_files()
    full = (
        spark.read.option("mergeSchema", "true")
        .parquet(index_path)
        .hint("rebalance", "cell")
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        full.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return before, _count_files()
