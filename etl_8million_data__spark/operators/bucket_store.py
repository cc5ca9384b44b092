"""Shared plumbing for the persisted bucket/cell-partitioned stores
(ANN indexes, dedup band/fingerprint indexes, SCD2/golden/IVM/diff
state tables). Starts with the read discipline; the marker-file and
bucket-overwrite helpers the door operators triplicate migrate here as
they consolidate.

READ DISCIPLINE (the 100 TB reason this module exists): every store
has a DECLARED schema — reading it back with
``option("mergeSchema", "true")`` launches an eager footer-merge job
over EVERY file in the store *before* any partition filter prunes
anything, so a probe that will touch 3 of 4096 cell directories still
pays a full-store metadata pass. At toy scale that is invisible; at a
100 TB cell-partitioned index it defeats the listing-time pruning the
probe layouts are built around. :func:`read_store` with the declared
schema plans with ZERO schema-inference reads — and still covers the
legacy-mixed-files case the footer-merge existed for: parquet files
written before a column existed (e.g. pre-batch-tagging index files
without ``_batch``) surface the declared column as NULL, which is
exactly what the merged schema produced. ``mergeSchema`` remains only
for callers that genuinely cannot declare a schema (fsck auditing
unknown layouts, generic compaction of arbitrary stores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_store(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a persisted store: with ``schema`` (the layout's FULL
    declared schema — an omitted column would vanish from any rewrite
    fed by this read), no footer is opened for schema inference and
    missing columns in legacy files read as NULL; without it, fall
    back to the eager ``mergeSchema`` footer-merge (legacy/unknown
    layouts only — never on a pruned probe path). Raises
    AnalysisException when the path does not exist; callers that treat
    a missing store as empty catch it and substitute an empty frame of
    the declared schema."""
    reader = spark.read
    reader = (
        reader.schema(schema)
        if schema
        else reader.option("mergeSchema", "true")
    )
    return reader.parquet(path)

def read_nb(root: str) -> int:
    """Read the store's bucket-modulus marker (``_nb`` sidecar, written
    once at init): the layout's true bucket count, which every pruned
    delta must hash with (a wrong modulus prunes to directories the
    keys don't live in and silently misses them)."""
    import os

    with open(os.path.join(root, "_nb")) as fh:
        return int(fh.read().strip())


def write_nb(root: str, nb: int) -> None:
    import os

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_nb"), "w") as fh:
        fh.write(str(nb))


def applied_batch(root: str) -> int | None:
    """Read the ``_applied_batch`` replay-guard sidecar: the id of the
    last micro-batch a non-idempotent door absorbed (scd2/golden/IVM
    streaming twins), or None when absent/garbled — at-least-once
    foreachBatch redelivery skips a batch whose id matches."""
    import os

    try:
        with open(os.path.join(root, "_applied_batch")) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def mark_applied(root: str, batch_id: int) -> None:
    import os

    with open(os.path.join(root, "_applied_batch"), "w") as fh:
        fh.write(str(batch_id))


def bucket_values(df: DataFrame, col: str, nb: int):
    """Distinct id_bucket values of ``col`` — a <= nb-element driver
    list (the literal-prune discipline: bucket count is bounded by the
    layout, never by data size)."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.operators.partitioning import id_bucket

    return [
        r["_b"]
        for r in df.select(
            id_bucket(F.col(col), nb).alias("_b")
        ).distinct().collect()
    ]


def pruned_read(
    spark: SparkSession,
    path: str,
    part_col: str,
    buckets: list[int],
    schema: str | None = None,
) -> DataFrame:
    """Literal-pruned read of a bucket-partitioned state table: with a
    declared ``schema`` the plan does zero footer reads and an EMPTY
    table (zero parquet files after a full erase) reads back as an
    empty frame of that schema; an empty bucket list short-circuits to
    a read-nothing filter."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        df = read_store(spark, path, schema) if schema else spark.read.parquet(path)
    except AnalysisException:
        if schema is None:
            raise
        df = spark.createDataFrame([], schema)
    return (
        df.filter(F.col(part_col).isin(buckets))
        if buckets
        else df.filter(F.lit(False))
    )


def write_table_bucketed(df: DataFrame, path: str, part_col: str) -> None:
    """Overwrite-write a state table in the bucketed layout with one
    file per bucket (repartition on the partition column), so a pruned
    read schedules |touched buckets| tasks, not |buckets| x |write
    tasks| tiny files."""
    from pyspark.sql import functions as F

    df.repartition(F.col(part_col)).write.mode("overwrite").partitionBy(
        part_col
    ).parquet(path)


def overwrite_buckets(
    spark: SparkSession,
    path: str,
    part_col: str,
    new_content: DataFrame,
    affected: list[int],
) -> None:
    """Replace exactly the ``affected`` bucket partitions of ``path``
    with ``new_content`` (which must hold those buckets' FULL new
    rows): dynamic partition overwrite rewrites the buckets that
    receive rows; a bucket emptied outright keeps a ghost directory
    dynamic overwrite cannot touch, so it is dropped explicitly (the
    forget_partitioned discipline)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    # lazy checkpoint: the surviving-buckets collect below reads the
    # content in full and is the job that materializes it
    new_content = new_content.localCheckpoint(eager=False)
    surviving = {
        r["_b"]
        for r in new_content.select(
            F.col(part_col).alias("_b")
        ).distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if surviving:
            new_content.repartition(F.col(part_col)).write.mode(
                "overwrite"
            ).partitionBy(part_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for b in affected:
        if b not in surviving:
            d = os.path.join(path, f"{part_col}={b}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    spark.catalog.refreshByPath(path)
    if part_col == "kb" and os.path.isfile(
        os.path.join(path, "_checksums", "_meta.json")
    ):
        # the table carries a diff/sync checksum summary: keep it
        # honest from the rows already in hand — the affected buckets'
        # full new content — so the routine replica audit
        # (diff_tables' summarized phase 1) never re-scans the table
        from etl_8million_data__spark.operators.diff import update_checksums

        update_checksums(spark, path, affected, new_content)
