"""Persisted positional inverted index — the TEXT-search analog of the
cell-partitioned ANN inverted file (``operators/incremental_ann``):
build once, append only new documents' postings (skip-existing by
doc_id), and probe phrases against the parquet index without ever
re-tokenizing the corpus.

Index layout: parquet rows (doc_id, pos, token) partitioned BY
``pfx`` = first hex char of md5(token) — 16 uniform partitions (a
hash prefix, so no hot partition for stopwords vs rare tokens at the
DIRECTORY level; within a partition, postings of a hot token are just
more rows, split by AQE).  A phrase probe joins the index on
(pfx, token) where the query-word side is a handful of broadcast
rows, so dynamic partition pruning restricts the scan to the probed
tokens' partitions — the I/O shape a persisted search index needs.

Phrase matching uses ANCHOR ALIGNMENT rather than a per-word join
chain: each (phrase, word-offset) candidate posting votes for anchor
``pos - off``; an anchor with votes from ALL offsets is a full
occurrence.  One join + one aggregate for ANY phrase length, repeated
words handled by counting DISTINCT offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.text import tokens

POSTINGS_SCHEMA = "doc_id long, pos bigint, token string, pfx string"


def _postings_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    t = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= 1)
    return t.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        "token",
        F.substring(F.md5(F.encode(F.col("token"), "UTF-8")), 1, 1).alias("pfx"),
    )


def build_postings(
    docs: DataFrame, index_path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize the index: tokenize (narrow map + explode), then a
    pfx-partitioned parquet write.  Overwrites any existing index."""
    _postings_frame(docs, text_col, id_col).write.mode("overwrite").partitionBy(
        "pfx"
    ).parquet(index_path)


def _read_index(spark: SparkSession, index_path: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(index_path)
    except AnalysisException:
        # first batch: index doesn't exist yet; any other failure
        # (corrupt files, permissions) must propagate.
        return spark.createDataFrame([], POSTINGS_SCHEMA)


def append_documents(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Skip-existing incremental append: documents whose doc_id is
    already indexed are dropped (the id read is column-pruned — parquet
    reads only the doc_id column); the rest tokenize and append into
    their tokens' pfx partitions.  Returns documents appended.
    Idempotent under replay through skip-existing alone (same contract
    as the ANN index's append_vectors)."""
    spark = new_docs.sparkSession
    existing = _read_index(spark, index_path).select("doc_id").distinct()
    fresh_docs = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    ).join(existing, "doc_id", "left_anti").localCheckpoint(eager=True)
    n = fresh_docs.count()
    if n:
        _postings_frame(fresh_docs, "_text", "doc_id").write.mode(
            "append"
        ).partitionBy("pfx").parquet(index_path)
    return n


def phrase_probe(
    spark: SparkSession, index_path: str, phrases: DataFrame,
    phrase_col: str = "phrase",
) -> DataFrame:
    """Match every phrase against the persisted index.  Returns
    (phrase, doc_id, n_occ, first_pos).

    The query side explodes each phrase into (word, offset) rows —
    a handful of rows, broadcast — and joins the index on
    (pfx, token): the pfx equi-key is the PARTITION column, so dynamic
    partition pruning skips every unprobed token partition's files.
    Anchor alignment then finds full occurrences with one aggregate:
    a candidate posting at position p for offset o votes for anchor
    p - o, and an anchor collecting ALL n_words distinct offsets is a
    complete phrase occurrence (repeated words need the DISTINCT)."""
    q = phrases.select(
        F.col(phrase_col).alias("phrase"),
        F.split(F.col(phrase_col), " ").alias("ws"),
    ).select(
        "phrase",
        F.size("ws").alias("n_words"),
        F.posexplode("ws").alias("off", "token"),
    ).filter(
        # guard against empty tokens from stray double spaces — also a
        # selective predicate on the probe side, which is what arms
        # Spark's dynamic-partition-pruning benefit heuristic for the
        # (pfx, token) join below
        F.length("token") > 0
    ).select(
        "phrase", "n_words",
        F.col("off").cast("bigint").alias("off"),
        "token",
        F.substring(F.md5(F.encode(F.col("token"), "UTF-8")), 1, 1).alias("pfx"),
    )
    idx = _read_index(spark, index_path)
    cand = idx.join(F.broadcast(q), ["pfx", "token"]).select(
        "phrase", "n_words", "doc_id", (F.col("pos") - F.col("off")).alias("anchor"),
        "off",
    )
    anchors = (
        cand.groupBy("phrase", "n_words", "doc_id", "anchor")
        .agg(F.count_distinct("off").alias("n_hit"))
        .filter((F.col("n_hit") == F.col("n_words")) & (F.col("anchor") >= 0))
    )
    return anchors.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("anchor").alias("first_pos")
    )
