"""Scalar column functions (SURVEY.md §2.8), all built-in-Spark
expressions (JVM-side, whole-stage-codegen friendly). Each docstring
cites the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def clean_str(col: Column) -> Column:
    """strip + empty-string->NULL (reference: details.py:262-271).

    Regexp strip, not F.trim: Spark's trim removes only 0x20 while the
    reference's str.strip() removes all whitespace ('AAPL\\n' must clean
    to 'AAPL') — same class of gap the hypothesis tests caught in
    collapse_ws."""
    return F.nullif(F.regexp_replace(col, r"^\s+|\s+$", ""), F.lit(""))


def collapse_ws(col: Column, max_len: int = 200_000) -> Column:
    """Collapse runs of whitespace to one space and cap length
    (reference: Summary.py:110-115).

    Collapse BEFORE trim: Spark's trim strips only spaces (0x20), so
    trimming first would leave a lone space for strings like ``"\\r"``
    where Python's str.strip() (the reference) removes all whitespace.
    Collapsing turns every edge-whitespace run into a plain space,
    which trim then removes — found by the hypothesis property test.
    """
    return F.substring(F.trim(F.regexp_replace(col, r"\s+", " ")), 1, max_len)


def parse_market_cap(col: Column) -> Column:
    """Parse suffixed market caps like ``32.42B`` / ``963.4K`` / ``3.01T``
    into USD doubles; ``-`` / empty / unparseable -> NULL.

    The reference stores ``market_cap`` as the raw scraped string
    (stocks_full.csv:2, written main.py:311-319) and never parses it;
    this is the §7.2(3) extension parser.
    """
    s = F.upper(F.trim(col))
    num = F.regexp_extract(s, r"^([0-9]*\.?[0-9]+)", 1).try_cast("double")
    mult = (
        F.when(s.endswith("T"), F.lit(1e12))
        .when(s.endswith("B"), F.lit(1e9))
        .when(s.endswith("M"), F.lit(1e6))
        .when(s.endswith("K"), F.lit(1e3))
        .otherwise(F.lit(1.0))
    )
    return (num * mult).alias("market_cap_usd")


def parse_date_prefix(col: Column) -> Column:
    """2-stage date parse parity: take the first 10 chars and parse
    ``yyyy-MM-dd``; unparseable -> NULL (caller filters), matching the
    skip-row semantics of Financilas.py:84-92."""
    return F.try_to_timestamp(F.substring(col, 1, 10), F.lit("yyyy-MM-dd")).cast("date")


def period_code(freq: Column, date_col: Column) -> Column:
    """yearly -> 4 else quarter(date) (reference: Financilas.py:94)."""
    return F.when(freq == "yearly", F.lit(4)).otherwise(F.quarter(date_col))


def nan_inf_to_null(col: Column) -> Column:
    """NaN/±Inf -> NULL (reference: details.py:88-101, Financilas.py:101-102)."""
    return F.when(F.isnan(col) | (F.abs(col) == float("inf")), F.lit(None)).otherwise(col)


def digits_to_int(col: Column) -> Column:
    """Strip non-digits then cast (employees parsing, Summary.py:186-198)."""
    return F.nullif(F.regexp_replace(col, "[^0-9]", ""), F.lit("")).try_cast("int")


def extract_founded_year(summary: Column) -> Column:
    """``founded in (\\d{4})`` -> int (reference: Summary.py:118,126-131)."""
    return F.nullif(
        F.regexp_extract(summary, r"(?i)\bfounded in (\d{4})\b", 1), F.lit("")
    ).try_cast("int")


def extract_former_name(summary: Column) -> Column:
    """``formerly known as ([^.,;]+)`` (reference: Summary.py:119,132-135)."""
    return F.nullif(
        F.regexp_replace(
            F.trim(F.regexp_extract(summary, r"(?i)\bformerly known as ([^.,;]+)", 1)),
            r"\s+",
            " ",
        ),
        F.lit(""),
    )


def headquarters_parts(summary: Column) -> Column:
    """``headquartered in ([^.]+?)`` -> comma-split, trimmed parts array
    (NULL when no match). Split out from :func:`extract_headquarters` so
    wide projections can stage this once as a named column instead of
    re-embedding the regex in every city/state/country branch — the
    un-staged form costs seconds of driver-side tree construction and
    codegen on a 13-column enrichment (see pipelines/summary.py)."""
    loc = F.nullif(
        F.trim(F.regexp_extract(summary, r"(?i)\bheadquartered in ([^.]+?)(?:\.|$)", 1)),
        F.lit(""),
    )
    return F.transform(F.split(loc, ","), lambda p: F.trim(p))


def headquarters_from_parts(parts: Column) -> tuple[Column, Column, Column]:
    """(city, state, country) with 1/2/3+-part positional assignment;
    3+ parts join the remainder into country (reference: Summary.py:120,136-147).
    """
    n = F.size(parts)
    city = F.when(n >= 1, F.element_at(parts, 1))
    state = F.when(n >= 3, F.element_at(parts, 2)).when(n == 2, F.lit(None).cast("string"))
    country = (
        F.when(n >= 3, F.array_join(F.slice(parts, 3, 1000), ", "))
        .when(n == 2, F.element_at(parts, 2))
        .otherwise(F.lit(None).cast("string"))
    )
    return city, state, country


def extract_headquarters(summary: Column) -> tuple[Column, Column, Column]:
    """One-shot form of headquarters_parts + headquarters_from_parts
    (reference: Summary.py:120,136-147)."""
    return headquarters_from_parts(headquarters_parts(summary))


def epoch_to_date(col: Column) -> Column:
    """Epoch seconds -> date (pyc ``_safe_get`` semantics: keys ending in
    ``Date`` go through utcfromtimestamp().date())."""
    return F.to_date(F.from_unixtime(col.cast("bigint")))
