"""Exact duplicated-substring span coverage — the corpus-level exact
substring dedup measure (Lee et al. 2022) as a fully oracle-checked
relational plan.  Extension beyond the reference (SURVEY.md §7.2(4))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
