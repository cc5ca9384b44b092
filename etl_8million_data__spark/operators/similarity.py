"""Similarity search over embedding columns (SURVEY.md §7.2(4)).

Cosine arithmetic is an explicit left-fold over the array so results
are bit-identical to the DuckDB oracle (same cast-to-double, same
accumulation order). Brute-force top-k is the correctness baseline;
IVF (label-partitioned coarse quantizer) is the scale path: at 100 TB
the candidate set per query shrinks from |N| to |N| * nprobe / ncells,
and the centroid table is broadcast.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hyperplane_weights(n_planes: int = 32, dim: int = 64) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: integer weights derived
    from md5(plane,dim), centered on 0. Integers (not floats) so the
    projection arithmetic is reproducible in any engine."""
    return [
        [
            int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:4], 16) - 32768
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm2(a: Column) -> Column:
    return _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column, na: Column | None = None, nb: Column | None = None) -> Column:
    """dot/(sqrt(|a|)*sqrt(|b|)); pass precomputed squared norms to
    avoid recomputation in joins."""
    na = norm2(a) if na is None else na
    nb = norm2(b) if nb is None else nb
    return dot(a, b) / (F.sqrt(na) * F.sqrt(nb))


def knn_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (queries ≪ corpus); the corpus is
    scanned once; ranking is a per-query window over |Q|·k rows after
    a cheap per-partition candidate cut is handled by the window itself.
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        norm2(F.col(vec_col)).alias("_n2"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        norm2(F.col(query_vec_col)).alias("_qn2"),
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        (dot(F.col("_qvec"), F.col("_vec")) / (F.sqrt("_qn2") * F.sqrt("_n2"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def lsh_bucket_array(
    vec: Column,
    weights: list[list[int]],
    tables: int = 8,
    planes_per_table: int = 4,
) -> Column:
    """Signed-random-projection LSH: per table, an integer bucket whose
    bits are the signs of ``planes_per_table`` hyperplane projections.
    Vectors within cos θ share a table-bucket with prob (1-θ/π)^planes;
    multiple tables trade candidate volume for recall. Returns an array
    of ``tables`` bucket ints (a narrow map stage — only (id, table,
    bucket) ever reaches the shuffle)."""

    def proj(p: int) -> Column:
        w = F.array(*[F.lit(x) for x in weights[p]])
        return F.aggregate(
            F.zip_with(w, vec, lambda wi, xi: wi * xi.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    buckets = []
    for t in range(tables):
        b: Column = F.lit(0)
        for j in range(planes_per_table):
            b = b + F.when(proj(t * planes_per_table + j) > 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
        buckets.append(b)
    return F.array(*buckets)


def lsh_candidate_pairs(
    emb: DataFrame,
    weights: list[list[int]],
    tables: int = 8,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct (vec_a < vec_b) pairs sharing any table-bucket."""
    sig = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            lsh_bucket_array(F.col(vec_col), weights, tables, planes_per_table)
        ).alias("tbl", "bucket"),
    ).localCheckpoint(eager=True)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


def label_centroids(emb: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label mean vector (the IVF coarse quantizer). Uses
    posexplode + groupBy so the shuffle carries (label, pos) partial
    sums — dim × ncells rows — not whole vectors."""
    pos = emb.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
    per_dim = pos.groupBy(label_col, "pos").agg(F.avg("val").alias("avg_val"))
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "avg_val"))), lambda s: s["avg_val"]
        ).alias("centroid")
    )


def knn_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: route each query to its nprobe nearest
    centroids (broadcast), then brute-force only within those cells.
    Approximation error appears when a true neighbor lives in an
    unprobed cell — the recall/cost knob is nprobe/ncells."""
    cents = label_centroids(emb, vec_col, label_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qvec")
    )
    routed = q.join(F.broadcast(cents)).select(
        "query_id",
        "_qvec",
        F.col(label_col).alias("probe_label"),
        cosine(F.col("_qvec"), F.col("centroid")).alias("_c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_c_cos").desc(), F.col("probe_label"))
    probes = routed.withColumn("_pr", F.row_number().over(wq)).filter(F.col("_pr") <= nprobe)

    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        F.col(label_col).alias("probe_label"),
    )
    scored = e.join(
        F.broadcast(probes.select("query_id", "_qvec", "probe_label")), "probe_label"
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "vec_id", cosine(F.col("_qvec"), F.col("_vec")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
