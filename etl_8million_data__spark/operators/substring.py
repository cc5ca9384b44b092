"""Exact duplicated-substring (span) detection over a document corpus.

The operator behind ``dedup_exact_substring_spans``: find every k-token
substring that occurs more than once anywhere in the corpus and report,
per document, how much of the document those duplicated spans cover —
the relational form of suffix-array exact-substring dedup from
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022).  Capability extension beyond the reference pipeline (SURVEY.md
§7.2(4)); the reference has no corpus-dedup surface at all.

Scale design (100 TB):
- The only wide exchanges carry ``(gram_md5, doc_id, position)`` —
  never document text.  Gram text is hashed to md5 *before* the
  shuffle, so shuffle payload is bounded at ~48 bytes/row.
- Duplicate detection is a ``groupBy(gram).count`` — map-side partial
  aggregation absorbs hot grams (boilerplate headers repeated millions
  of times) before the exchange, which a window-over-gram formulation
  could not do.  The follow-up semi join is co-partitioned with the
  aggregate, so AQE plans it shuffle-free on the probe side.
- Span coverage (interval union) is a per-document window — partitions
  are documents, bounded by document length, no skew beyond the
  longest document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.dedup import spread
from etl_8million_data__spark.operators.text import tokens


def token_gram_positions(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Returns ``(base, grams)``: ``base`` = ``(doc_id, n_tokens)`` for
    every document, ``grams`` = ``(doc_id, n_tokens, s, gk)`` with
    ``gk`` the md5 of the k-token gram starting at 1-based token
    position ``s``.  Documents shorter than k tokens produce no gram
    rows (they still appear in ``base`` and get zero coverage).  The
    token array is staged as a named column so the
    interpreted transform() lambda slices a materialized array instead
    of re-running the tokenizer per gram (see operators/text.py)."""
    toks_df = (
        spread(docs, id_col)
        .select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(id_col, "toks", F.size("toks").alias("n_tokens"))
    )
    grams = (
        toks_df.filter(F.col("n_tokens") >= k)
        .select(
            id_col,
            "n_tokens",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_tokens") - k),
                    lambda i: F.md5(
                        F.encode(F.array_join(F.slice(F.col("toks"), i + 1, k), " "), "UTF-8")
                    ),
                )
            ).alias("pos0", "gk"),
        )
        .select(id_col, "n_tokens", (F.col("pos0") + 1).alias("s"), "gk")
    )
    return toks_df.select(id_col, "n_tokens"), grams


def duplicated_spans(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(base, spans)``: ``base`` = ``(doc_id, n_tokens)``,
    ``spans`` = the ``[s, e]`` token intervals (1-based, inclusive)
    occupied by corpus-duplicated k-grams.  Shared by the coverage
    measure and the span-cutting action."""
    base, grams = token_gram_positions(docs, k, id_col, text_col)
    # The gram stage (tokenize + md5 per position) is the dominant CPU
    # cost and feeds BOTH the duplicate-key aggregate and the span side
    # of the semi join; materialize it once instead of recomputing the
    # whole explode chain per consumer (same pattern as the shared
    # shingle frame in dedup_ngram_jaccard_pairs).
    grams = grams.localCheckpoint(eager=True)
    dup_keys = (
        grams.groupBy("gk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("gk")
    )
    spans = (
        grams.join(dup_keys, "gk", "left_semi")
        .select(id_col, "s", (F.col("s") + (k - 1)).alias("e"))
    )
    return base, spans


def cut_duplicated_spans(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The dedup ACTION to `duplicated_span_coverage`'s measure: remove
    every token covered by a corpus-duplicated k-gram span and
    fingerprint the surviving text.

    Returns ``(doc_id, n_tokens, n_kept, cleaned_md5)`` for every
    document (docs without duplicated spans keep all tokens).  Coverage
    is decided by the signed-boundary running sum — each span emits
    (+1 at s, -1 at e+1) and a token at position p is covered when the
    running sum over boundaries-before-tokens is positive — the same
    no-fan-out trick as the interval_count_backward range aggregate, so
    overlapping spans cost 2 rows each instead of a per-token interval
    join.  One doc-keyed sort covers boundary merge + reconstruction
    order; the cleaned text never leaves the executors (only its md5
    and counts return)."""
    base, spans = duplicated_spans(docs, k, id_col, text_col)
    bounds = spans.select(
        id_col, F.col("s").alias("p"), F.lit(0).alias("_is_tok"), F.lit(1).alias("_d"),
        F.lit(None).cast("string").alias("tok"),
    ).unionByName(
        spans.select(
            id_col,
            (F.col("e") + 1).alias("p"),
            F.lit(0).alias("_is_tok"),
            F.lit(-1).alias("_d"),
            F.lit(None).cast("string").alias("tok"),
        )
    )
    toks = (
        spread(docs, id_col)
        .select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(
            id_col,
            F.posexplode("toks").alias("pos0", "tok"),
        )
        .select(
            id_col,
            (F.col("pos0") + 1).alias("p"),
            F.lit(1).alias("_is_tok"),
            F.lit(0).alias("_d"),
            "tok",
        )
    )
    u = toks.unionByName(bounds)
    w = (
        Window.partitionBy(id_col)
        .orderBy("p", "_is_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = u.select(
        id_col, "p", "_is_tok", "tok", F.sum("_d").over(w).alias("_depth")
    ).filter(F.col("_is_tok") == 1)
    cleaned = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_depth") <= 0, F.struct("p", "tok")).otherwise(None)
                )
            ),
            lambda s: s["tok"],
        ),
        " ",
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("_depth") <= 0, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.md5(F.encode(cleaned, "UTF-8")).alias("cleaned_md5"),
    )


def duplicated_span_coverage(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document coverage of corpus-duplicated k-token substrings.

    Returns ``(doc_id, n_tokens, dup_positions, dup_tokens, dup_frac)``
    for EVERY document: ``dup_positions`` is how many gram start
    positions belong to a duplicated gram (>= 2 occurrences anywhere in
    the corpus, including within the same document), ``dup_tokens`` is
    the token count covered by the union of those [s, s+k-1] spans
    (overlaps merged by a per-document interval-union window), and
    ``dup_frac`` = dup_tokens / n_tokens is the trainable-data loss if
    duplicated spans were cut.
    """
    base, spans = duplicated_spans(docs, k, id_col, text_col)
    prev = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = spans.withColumn("prev_max", F.max("e").over(prev)).withColumn(
        "contrib",
        F.greatest(
            F.lit(0),
            F.col("e") - F.greatest(F.coalesce(F.col("prev_max"), F.lit(0)), F.col("s") - 1),
        ),
    )
    per_doc = cov.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_positions"),
        F.sum("contrib").cast("bigint").alias("dup_tokens"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("dup_positions"), F.lit(0)).cast("bigint").alias("dup_positions"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias("dup_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double") / F.col("n_tokens")
        ).alias("dup_frac"),
    )
