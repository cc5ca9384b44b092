"""Deduplication operators for training-data pipelines
(SURVEY.md §7.2(4)): exact, MinHash+LSH, SimHash.

All are compositions of built-in DataFrame ops — no Python UDFs — so
Catalyst sees the whole plan. Scale notes per operator:

- exact:    one hash-groupBy shuffle on a 32-byte key; at 100 TB,
            AQE coalesces the post-shuffle partitions.
- minhash:  signatures are computed in a narrow map stage (nested
            higher-order functions); only the (doc_id, band_key) pairs
            — tiny — hit the shuffle for the LSH self-join. The
            candidate-pair join is an equi-join on band_key, so skew =
            hot buckets; AQE skew-join splits those.
- simhash:  narrow map stage, one 64-bit int per doc.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.text import (
    md5_utf8,
    normalize_text,
    tokens,
    word_shingles,
)


def exact_fingerprint(text_col: Column) -> Column:
    """md5 of normalized text — exact-dup group key."""
    return md5_utf8(normalize_text(text_col))


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: fingerprint, dup_count, canonical
    (lowest) id — the 'hash-groupBy' exact dedup."""
    return (
        df.select(F.col(id_col), exact_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for seed j, min over shingles of
    md5(j || '|' || shingle). String-min over lowercase hex is a total
    order both engines agree on; empty shingle sets yield NULL mins and
    must be filtered upstream."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(
                shingle_col,
                lambda s: md5_utf8(F.concat(j.cast("string"), F.lit("|"), s)),
            )
        ),
    )


def lsh_band_keys(sig_col: Column, bands: int = 4, rows: int = 4) -> Column:
    """Group the signature into ``bands`` bands of ``rows`` hashes; band
    key = md5 of the joined slice. Docs sharing any band key are
    candidate near-duplicates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            md5_utf8(F.array_join(F.slice(sig_col, b * rows + 1, rows), ",")).alias("band_key"),
        ),
    )


def spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition by id before CPU-heavy per-row work.

    Small fixture files arrive as one input split, which would serialize
    the md5-heavy stages onto a single core; on a real cluster this
    same repartition balances skewed file sizes. Cost: one shuffle of
    the raw rows — cheap relative to the per-row hashing it parallelizes.
    """
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism, F.col(id_col))


def doc_shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, distinct shingle set) for docs with >= k tokens."""
    toks = tokens(F.col(text_col))
    return (
        spread(df, id_col)
        .select(F.col(id_col), F.array_distinct(word_shingles(toks, k)).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash LSH.
    Pass ``shingles`` (a doc_shingle_frame) to share the tokenize+shingle
    stage with a downstream verifier instead of computing it twice."""
    rows = num_hashes // bands
    sh = shingles if shingles is not None else doc_shingle_frame(df, text_col, id_col, k)
    sig = sh.select(id_col, minhash_signature(F.col("shingles"), num_hashes).alias("sig"))
    band = sig.select(
        id_col, F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    # materialize once: the self-join would otherwise recompute the md5
    # signature pipeline for both sides. The band frame is tiny
    # (|docs| × bands rows of ~40 bytes); at petabyte scale you'd land
    # it in a temp table instead of executor storage.
    band = band.localCheckpoint(eager=True)
    a = band.alias("a")
    b = band.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates filtered by exact shingle-set Jaccard >= threshold.
    Joins shingle sets only for the candidate pairs (the LSH output),
    never all-pairs — this is what keeps it sub-quadratic at scale."""
    # shingle sets feed the LSH pipeline AND both pair sides: compute once
    sh = doc_shingle_frame(df, text_col, id_col, k).localCheckpoint(eager=True)
    pairs = minhash_lsh_candidate_pairs(df, text_col, id_col, k, shingles=sh)
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32_frame(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 32-bit SimHash over each doc's distinct-token set.

    Fully relational formulation: explode distinct tokens to rows, md5
    each token ONCE, extract its 32 bits with shift/mask integer ops,
    and sum ±1 per bit in a single hash aggregate. Every stage is
    WholeStageCodegen (a higher-order-function fold over the token
    array is CodegenFallback and evaluates ~30× slower); the one
    shuffle moves skinny (id, 32 smallints) partial aggregates, and
    per-token rows parallelize huge documents instead of serializing
    them into one array. Near-dup distance = popcount(xor).
    """
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("_t")
    )
    v = F.conv(F.substring(md5_utf8(F.col("_t")), 1, 8), 16, 10).cast("bigint")
    ints = tok.select(id_col, v.alias("_v"))
    # score_b = sum over tokens of (2*bit_b - 1); simhash bit b = score_b > 0
    scores = ints.groupBy(id_col).agg(
        *[
            F.sum(2 * F.shiftright(F.col("_v"), 31 - b).bitwiseAND(F.lit(1)) - 1).alias(f"_s{b}")
            for b in range(32)
        ]
    )
    sim = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"_s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for b in range(32)
        ],
    )
    return scores.select(id_col, sim.alias("simhash"))
