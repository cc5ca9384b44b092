"""Incremental ANN over a persisted, cell-partitioned SRP inverted file
— the similarity-search analog of ``operators/incremental_dedup``: the
corpus index is built once, new vector batches append only their own
cell assignments, and queries probe the persisted index without ever
recomputing corpus-side state (the batch-vs-corpus inversion of the
reference's anti-join skip-existing increment, details.py:82-101).

Index layout: parquet partitioned BY CELL — rows
(vec_id, embedding, _n2, _batch) under ``cell=<int>/`` directories.
The cell count is 2^n_bits (bounded, corpus-size-adaptive via
``adaptive_n_bits``), so the partition count never explodes; each probe
equi-joins on the partition column, which makes Spark's dynamic
partition pruning skip every unprobed cell's files at scan time — the
I/O shape a 100 TB vector store needs (read nprobe/2^n_bits of the
data, not all of it). Squared norms are precomputed at index time so
the scoring join does no per-row norm work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.similarity import (
    dot,
    norm2,
    projections,
    srp_cell,
    srp_probe_cells,
)

INDEX_SCHEMA = "vec_id long, embedding array<double>, _n2 double, _batch string, cell int"


def _cell_frame(
    emb: DataFrame,
    weights: list[list[int]],
    n_bits: int,
    id_col: str,
    vec_col: str,
    batch_tag: str | None,
) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        v.alias("embedding"),
        norm2(F.col(vec_col)).alias("_n2"),
        F.lit(batch_tag).cast("string").alias("_batch"),
        srp_cell(projections(F.col(vec_col), weights, n_bits), n_bits).alias("cell"),
    )


def build_index(
    emb: DataFrame,
    index_path: str,
    weights: list[list[int]],
    n_bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: str | None = "seed",
) -> None:
    """Materialize the inverted file: one narrow map assigns every
    vector its SRP cell (no shuffle), then a cell-partitioned parquet
    write. Overwrites any existing index."""
    _cell_frame(emb, weights, n_bits, id_col, vec_col, batch_tag).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(index_path)


def _read_index(spark: SparkSession, index_path: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option("mergeSchema", "true").parquet(index_path)
    except AnalysisException:
        # first batch: index doesn't exist yet; any other failure
        # (corrupt files, permissions) must propagate.
        return spark.createDataFrame([], INDEX_SCHEMA)


def append_vectors(
    new_emb: DataFrame,
    index_path: str,
    weights: list[list[int]],
    n_bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: str | None = None,
) -> int:
    """Skip-existing incremental append: new vectors whose vec_id is
    already indexed are dropped (the id read is column-pruned to the
    vec_id column only — parquet reads nothing else); the rest get cell
    assignments (narrow map) and append into their cell partitions.
    Returns the number of vectors appended."""
    spark = new_emb.sparkSession
    existing = _read_index(spark, index_path).select("vec_id")
    fresh = (
        _cell_frame(new_emb, weights, n_bits, id_col, vec_col, batch_tag)
        .join(existing, "vec_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy("cell").parquet(index_path)
    return n


def probe_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    weights: list[list[int]],
    n_bits: int,
    k: int = 10,
    nprobe: int = 5,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k cosine neighbors for each query against the
    persisted index: queries fan out to ``nprobe`` multiprobe cells and
    equi-join the index on its PARTITION column, so dynamic partition
    pruning restricts the scan to the probed cells' files. Same scoring
    and ranking semantics as ``knn_ivf`` — a probe against the persisted
    index returns exactly what a fresh in-memory build would (asserted
    in tests), so index persistence is a pure I/O optimization, not a
    semantic fork."""
    idx = _read_index(spark, index_path)
    qp = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        norm2(F.col(query_vec_col)).alias("_qn2"),
        F.explode(
            srp_probe_cells(
                projections(F.col(query_vec_col), weights, n_bits), n_bits, nprobe
            )
        ).alias("cell"),
    )
    # Unhinted equi-join on the partition column: AQE broadcasts qp when
    # |Q| is genuinely small (which also arms dynamic partition pruning
    # / runtime filters on the partitioned scan) and falls back to a
    # skew-splittable shuffle when |Q| grows with the corpus.
    scored = (
        idx.join(qp, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                dot(F.col("_qvec"), F.col("embedding"))
                / (F.sqrt("_qn2") * F.sqrt("_n2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
