"""Exact duplicated-substring span coverage — the corpus-level exact
substring dedup measure (Lee et al. 2022) as a fully oracle-checked
relational plan.  Extension beyond the reference (SURVEY.md §7.2(4))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.substring import duplicated_span_coverage
from etl_8million_data__spark.plans.registry import register

# DuckDB mirror of operators/text.py tokens(): lower+trim+collapse, then
# whitespace split; 1-based gram positions; md5 of the space-joined gram.
_K = 8
_TOKS = r"string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')"


@register(
    "dedup_exact_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents),
    base AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
    g AS (
      SELECT doc_id, u.i AS s,
             md5(array_to_string(t[u.i:u.i+{_K - 1}], ' ')) AS gk
      FROM toks, unnest(range(1, len(t) - {_K - 2})) AS u(i)
      WHERE len(t) >= {_K}),
    dupk AS (SELECT gk FROM g GROUP BY gk HAVING count(*) >= 2),
    d AS (SELECT g.doc_id, g.s, g.s + {_K - 1} AS e FROM g JOIN dupk USING (gk)),
    cov AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM d),
    per_doc AS (
      SELECT doc_id,
             count(*) AS dup_positions,
             CAST(sum(greatest(0, e - greatest(coalesce(prev_max, 0), s - 1))) AS BIGINT)
               AS dup_tokens
      FROM cov GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(p.dup_positions, 0) AS BIGINT) AS dup_positions,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / b.n_tokens AS dup_frac
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("dedup", "substring", "spans", "extension", "scale-path"),
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage of corpus-duplicated 8-token substrings —
    exact-substring dedup (the suffix-array method of Lee et al. 2022)
    re-expressed relationally: gram-hash -> groupBy(count>=2) ->
    co-partitioned semi join -> per-doc interval-union window.  Only
    (gram_md5, doc_id, pos) tuples ever shuffle; hot grams collapse in
    map-side partial aggregation (see operators/substring.py)."""
    return duplicated_span_coverage(load_table(spark, sf_dir, "documents"), k=_K)


@register(
    "corpus_content_defined_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents),
    pos AS (
      SELECT doc_id, u.i + 1 AS p, t[u.i + 1] AS tok,
             CASE WHEN substr(md5(t[u.i + 1]), 1, 1) = '0' THEN 1 ELSE 0 END AS b
      FROM toks, unnest(range(len(t))) AS u(i)),
    ch AS (
      SELECT doc_id, p, tok,
             sum(b) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
      FROM pos),
    chunks AS (
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(min(p) AS BIGINT) AS start_pos,
             CAST(count(*) AS BIGINT) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
      FROM ch GROUP BY doc_id, chunk_id)
    SELECT doc_id, chunk_id, start_pos, n_tokens, chunk_md5,
           CAST(count(*) OVER (PARTITION BY chunk_md5) AS BIGINT) AS shared
    FROM chunks
    """,
    tags=("dedup", "chunking", "cdc", "extension", "scale-path"),
)
def corpus_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (LBFS/rolling-boundary style): a token
    starts a new chunk when its md5 begins with '0' (p = 1/16, ~16-token
    expected chunks), so chunk boundaries survive insertions/deletions —
    the property that makes CDC the storage-dedup chunker.  Output is
    one row per (doc, chunk) with its fingerprint and the corpus-wide
    count of documents/chunks sharing that fingerprint (`shared` > 1 =
    dedupable chunk).

    Scale: boundary flags and the running chunk counter are one
    doc-partitioned window; chunk assembly is a (doc, chunk) groupBy
    sharing that partitioning; only the final fingerprint-count window
    shuffles by chunk_md5 — each carries fixed-width rows, never full
    text beyond the chunk being assembled."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks_staged = d.select("doc_id", tokens_col().alias("toks"))
    pos = toks_staged.select(
        "doc_id",
        F.posexplode("toks").alias("pos0", "tok"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("p"),
        "tok",
        F.when(F.substring(F.md5(F.encode("tok", "UTF-8")), 1, 1) == "0", 1)
        .otherwise(0)
        .alias("b"),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ch = pos.withColumn("chunk_id", F.sum("b").over(wcum))
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "tok"))), lambda s: s["tok"]
        ),
        " ",
    )
    chunks = ch.groupBy("doc_id", F.col("chunk_id").cast("bigint").alias("chunk_id")).agg(
        F.min("p").cast("bigint").alias("start_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.md5(F.encode(joined, "UTF-8")).alias("chunk_md5"),
    )
    wshared = Window.partitionBy("chunk_md5")
    return chunks.withColumn(
        "shared", F.count(F.lit(1)).over(wshared).cast("bigint")
    )


def tokens_col():
    """Staged token-array column (see operators/text.tokens)."""
    from etl_8million_data__spark.operators.text import tokens as _tokens

    return _tokens(F.col("text"))


@register(
    "dedup_cut_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (
      SELECT doc_id, u.i AS s,
             md5(array_to_string(t[u.i:u.i+{_K - 1}], ' ')) AS gk
      FROM toks, unnest(range(1, len(t) - {_K - 2})) AS u(i)
      WHERE len(t) >= {_K}),
    dupk AS (SELECT gk FROM g GROUP BY gk HAVING count(*) >= 2),
    d AS (SELECT g.doc_id, g.s, g.s + {_K - 1} AS e FROM g JOIN dupk USING (gk)),
    bounds AS (
      SELECT doc_id, s AS p, 0 AS is_tok, 1 AS dd, NULL AS tok FROM d
      UNION ALL
      SELECT doc_id, e + 1 AS p, 0 AS is_tok, -1 AS dd, NULL AS tok FROM d),
    tokrows AS (
      SELECT doc_id, u.i + 1 AS p, 1 AS is_tok, 0 AS dd, t[u.i + 1] AS tok
      FROM toks, unnest(range(len(t))) AS u(i)),
    marked AS (
      SELECT doc_id, p, is_tok, tok,
             sum(dd) OVER (PARTITION BY doc_id ORDER BY p, is_tok
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
      FROM (SELECT * FROM tokrows UNION ALL SELECT * FROM bounds))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN depth <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (depth <= 0), ''))
             AS cleaned_md5
    FROM marked
    WHERE is_tok = 1
    GROUP BY doc_id
    """,
    tags=("dedup", "substring", "spans", "action", "extension", "scale-path"),
)
def dedup_cut_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION form of dedup_exact_substring_spans: remove every
    token covered by a corpus-duplicated 8-gram span and fingerprint
    the surviving text (Lee et al. 2022 cut semantics).  Coverage is a
    signed-boundary running sum — overlapping spans cost 2 rows each,
    never a per-token interval join — and the cleaned text stays on
    executors (only counts + md5 return)."""
    from etl_8million_data__spark.operators.substring import cut_duplicated_spans

    return cut_duplicated_spans(load_table(spark, sf_dir, "documents"), k=_K)


@register(
    "corpus_dedup_report_by_source",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents),
    ex AS (
      SELECT source, count(*) AS n_docs,
             CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
      FROM n GROUP BY source),
    toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents),
    base AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
    g AS (
      SELECT doc_id, u.i AS s,
             md5(array_to_string(t[u.i:u.i+{_K - 1}], ' ')) AS gk
      FROM toks, unnest(range(1, len(t) - {_K - 2})) AS u(i)
      WHERE len(t) >= {_K}),
    dupk AS (SELECT gk FROM g GROUP BY gk HAVING count(*) >= 2),
    d AS (SELECT g.doc_id, g.s, g.s + {_K - 1} AS e FROM g JOIN dupk USING (gk)),
    cov AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM d),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(greatest(0, e - greatest(coalesce(prev_max, 0), s - 1))) AS BIGINT)
               AS dup_tokens
      FROM cov GROUP BY doc_id),
    sp AS (
      SELECT dd.source,
             CAST(sum(coalesce(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
             CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens
      FROM base b
      JOIN documents dd USING (doc_id)
      LEFT JOIN per_doc p USING (doc_id)
      GROUP BY dd.source)
    SELECT ex.source, ex.n_docs, ex.n_exact_dups,
           sp.dup_tokens AS span_dup_tokens, sp.n_tokens AS total_tokens,
           CAST(sp.dup_tokens AS DOUBLE) / sp.n_tokens AS span_dup_frac
    FROM ex JOIN sp USING (source)
    """,
    tags=("dedup", "report", "corpus", "extension"),
)
def corpus_dedup_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup dashboard — the composition report a corpus
    team reads before choosing cut thresholds: document count, exact
    duplicates (fingerprint collisions), and the source's duplicated
    8-gram span coverage.  The span fraction is a ratio of integer
    token SUMS (sum(dup_tokens)/sum(n_tokens)), never an average of
    per-doc doubles — order-insensitive and bit-exact across engines."""
    from etl_8million_data__spark.operators.dedup import exact_fingerprint
    from etl_8million_data__spark.operators.substring import duplicated_span_coverage

    d = load_table(spark, sf_dir, "documents")
    ex = (
        d.select("source", exact_fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("fp")))
            .cast("bigint")
            .alias("n_exact_dups"),
        )
    )
    cov = duplicated_span_coverage(d)
    sp = (
        cov.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("dup_tokens").cast("bigint").alias("span_dup_tokens"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )
    return ex.join(sp, "source").select(
        "source",
        "n_docs",
        "n_exact_dups",
        "span_dup_tokens",
        "total_tokens",
        (F.col("span_dup_tokens").cast("double") / F.col("total_tokens")).alias(
            "span_dup_frac"
        ),
    )
