"""Text-pipeline column builders shared by the dedup / text-analysis
operators (SURVEY.md §7.2(4) extensions for training-data pipelines).

Everything here is built-in Spark expressions (whole-stage codegen, no
Python in the hot path) and has an exact DuckDB mirror used by the
oracle SQL — tokenization and hashing must agree bit-for-bit.

Portable hashing scheme (same in both engines):
- md5 hex (lowercase) is the only hash primitive;
- hex->int conversions fold over characters so no engine-specific
  hash/conv function is load-bearing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in")
WORD_RE = r"([a-z0-9]+)"


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse whitespace — canonical form for dedup."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles as space-joined strings; empty array when the doc
    has fewer than k tokens (guards sequence() against negative spans).

    IMPORTANT: pass a *named column* holding the token array, not the
    ``tokens(text)`` expression tree. transform() is CodegenFallback
    (interpreted), and in interpreted eval the lambda body re-evaluates
    its argument subtree per element — an inlined tokens() expression
    re-runs the regex tokenizer once per shingle (~8x slower measured on
    sf0.1 documents). A named column makes each slice hit the already
    materialized array."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def md5_utf8(col: Column) -> Column:
    """Lowercase md5 hex of a string — identical to DuckDB md5()."""
    return F.md5(F.encode(col, "UTF-8"))


def hex_char_val(ch: Column) -> Column:
    """Value of one lowercase hex char (mirror: strpos('0123…f', ch)-1)."""
    return F.conv(ch, 16, 10).cast("bigint")


def hex_prefix_int(hex_col: Column, n_chars: int) -> Column:
    """First ``n_chars`` hex chars -> bigint
    (mirror: list_reduce over strpos values — same base-16 fold)."""
    return F.conv(F.substring(hex_col, 1, n_chars), 16, 10).cast("bigint")
