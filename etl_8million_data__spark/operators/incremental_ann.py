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


def _read_index(
    spark: SparkSession, index_path: str, schema: str | None = None
) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option("mergeSchema", "true").parquet(index_path)
    except AnalysisException:
        # first batch: index doesn't exist yet; any other failure
        # (corrupt files, permissions) must propagate.
        return spark.createDataFrame([], schema or INDEX_SCHEMA)


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


# --- int8-coded index variant: the production composition (coarse SRP
# routing + bandwidth-efficient integer scoring) persisted. Codes are
# 4x smaller than float vectors and the probe's scoring join moves only
# (vec_id, q, nq) — per-vector scales cancel in the cosine ranking, so
# they are not even stored.

INT8_INDEX_SCHEMA = "vec_id long, q array<int>, nq long, _batch string, cell int"


def _idot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _int8_cell_frame(
    emb: DataFrame,
    weights: list[list[int]],
    n_bits: int,
    id_col: str,
    vec_col: str,
    batch_tag: str | None,
) -> DataFrame:
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(xd, lambda v: F.abs(v)))
    s = emb.select(
        F.col(id_col).alias("vec_id"), xd.alias("_xd"), scale.alias("_scale")
    ).filter(F.col("_scale") > 0)
    q = F.transform(
        F.col("_xd"),
        lambda v: (
            F.signum(v) * F.floor(F.abs(v) / F.col("_scale") * 127 + F.lit(0.5))
        ).cast("int"),
    )
    return s.select(
        "vec_id",
        q.alias("q"),
        _idot(q, q).alias("nq"),
        F.lit(batch_tag).cast("string").alias("_batch"),
        # routing on the FLOAT vector (quantization noise must not move
        # a vector across a cell boundary)
        srp_cell(projections(F.col("_xd"), weights, n_bits), n_bits).alias("cell"),
    )


def build_index_int8(
    emb: DataFrame,
    index_path: str,
    weights: list[list[int]],
    n_bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: str | None = "seed",
) -> None:
    """Materialize the int8-coded inverted file (cell-partitioned).
    Zero-scale (all-zero) vectors are excluded — they have no cosine."""
    _int8_cell_frame(emb, weights, n_bits, id_col, vec_col, batch_tag).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(index_path)


def append_vectors_int8(
    new_emb: DataFrame,
    index_path: str,
    weights: list[list[int]],
    n_bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: str | None = None,
) -> int:
    """Skip-existing append of int8 codes (same contract as
    :func:`append_vectors`)."""
    spark = new_emb.sparkSession
    existing = _read_index(spark, index_path, INT8_INDEX_SCHEMA).select("vec_id")
    fresh = (
        _int8_cell_frame(new_emb, weights, n_bits, id_col, vec_col, batch_tag)
        .join(existing, "vec_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy("cell").parquet(index_path)
    return n


def score_int8(index: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Rank int8 candidates: integer dot / sqrt of integer norms — the
    per-vector scales cancel, so the ranking needs only the stored
    codes. ``probes``: (query_id, qq array<int>, qnq long, cell)."""
    scored = (
        index.join(probes, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _idot(F.col("qq"), F.col("q")).cast("double")
                / (F.sqrt(F.col("qnq").cast("double")) * F.sqrt(F.col("nq").cast("double")))
            ).alias("q_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("q_cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def probe_index_int8(
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
    """int8-over-IVF probe against the persisted index: queries are
    quantized with their own scale (which cancels in the ranking),
    routed by their FLOAT projections to ``nprobe`` cells, and scored
    with pure integer dots inside the DPP-pruned cell partitions."""
    idx = _read_index(spark, index_path, INT8_INDEX_SCHEMA)
    xd = F.transform(F.col(query_vec_col), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(xd, lambda v: F.abs(v)))
    s = queries.select(
        F.col(query_id_col).alias("query_id"), xd.alias("_xd"), scale.alias("_scale")
    ).filter(F.col("_scale") > 0)
    qq = F.transform(
        F.col("_xd"),
        lambda v: (
            F.signum(v) * F.floor(F.abs(v) / F.col("_scale") * 127 + F.lit(0.5))
        ).cast("int"),
    )
    probes = s.select(
        "query_id",
        qq.alias("qq"),
        _idot(qq, qq).alias("qnq"),
        F.explode(
            srp_probe_cells(projections(F.col("_xd"), weights, n_bits), n_bits, nprobe)
        ).alias("cell"),
    )
    return score_int8(idx, probes, k)
