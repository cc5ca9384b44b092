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
