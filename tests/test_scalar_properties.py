"""Property-based tests (hypothesis) for the §2.8 scalar functions —
adversarial inputs beyond the fixture values. Each example batch is one
Spark job over a generated column; properties assert the reference
semantics (skip-row NULLs, strict-date prefix parse, suffix arithmetic)
rather than re-implementing the expression."""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_8million_data__spark.functions.scalars import (
    clean_str,
    collapse_ws,
    digits_to_int,
    nan_inf_to_null,
    parse_date_prefix,
    parse_market_cap,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

junky_text = st.text(
    alphabet="0123456789-. abcKMBTkmbt\t\n#",
    min_size=0,
    max_size=24,
)


def _run(spark, values, col_fn, out_type="string"):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["o"] for r in df.select(col_fn(F.col("v")).cast(out_type).alias("o")).collect()]


@given(st.lists(junky_text, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_clean_str_trims_and_nulls(spark, vals):
    out = _run(spark, vals, clean_str)
    for v, o in zip(vals, out):
        if v.strip() == "":
            assert o is None
        else:
            assert o == v.strip()


@given(st.lists(st.text(alphabet=" \t\n\ra bz", max_size=30), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_collapse_ws_no_runs_and_idempotent(spark, vals):
    out = _run(spark, vals, collapse_ws)
    for o in out:
        assert "  " not in o and not o.startswith(" ") and not o.endswith(" ")
    again = _run(spark, out, collapse_ws)
    assert again == out


@given(
    st.lists(
        st.tuples(
            st.integers(1, 99999), st.integers(0, 99), st.sampled_from("KMBT")
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_parse_market_cap_suffix_arithmetic(spark, triples):
    mult = {"K": 1e3, "M": 1e6, "B": 1e9, "T": 1e12}
    vals = [f"{whole}.{frac:02d}{sfx}" for whole, frac, sfx in triples]
    out = _run(spark, vals, parse_market_cap, "double")
    for (whole, frac, sfx), o in zip(triples, out):
        expected = (whole + frac / 100.0) * mult[sfx]
        assert o is not None and abs(o - expected) <= 1e-6 * expected


@given(st.lists(st.sampled_from(["-", "", "n/a", "abc", "..B", "B", "-5B"]), min_size=1))
@settings(**_SETTINGS)
def test_parse_market_cap_junk_is_null(spark, vals):
    assert all(o is None for o in _run(spark, vals, parse_market_cap, "double"))


@given(st.lists(junky_text, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_digits_to_int_model(spark, vals):
    out = _run(spark, vals, digits_to_int, "int")
    for v, o in zip(vals, out):
        digits = re.sub(r"[^0-9]", "", v)
        if digits == "" or int(digits) > 2**31 - 1:
            assert o is None
        else:
            assert o == int(digits)


@given(
    st.lists(
        st.one_of(
            st.dates(dt.date(1, 1, 1), dt.date(9999, 12, 31)).map(
                lambda d: d.isoformat() + "T09:30:00Z"
            ),
            junky_text,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_parse_date_prefix_strict_dates(spark, vals):
    out = _run(spark, vals, parse_date_prefix, "string")
    for v, o in zip(vals, out):
        head = v[:10]
        if re.fullmatch(r"\d{4}-\d{2}-\d{2}", head):
            try:
                expected = dt.date.fromisoformat(head).isoformat()
            except ValueError:
                expected = None
            assert o == expected
        # non-conforming prefixes may parse only if Spark's lenient
        # forms accept them; the reference-path guarantee is the strict
        # branch above plus: junk without digits never parses
        elif not any(ch.isdigit() for ch in v):
            assert o is None


@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True),
            st.floats(-1e12, 1e12),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_nan_inf_to_null(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = [r["o"] for r in df.select(nan_inf_to_null(F.col("v")).alias("o")).collect()]
    import math

    for v, o in zip(vals, out):
        if math.isnan(v) or math.isinf(v):
            assert o is None
        else:
            assert o == v


_HQ_RE = re.compile(r"\bheadquartered in ([^.]+?)(?:\.|$)", re.IGNORECASE)


def _hq_model(text):
    """Python model of the reference's split logic (Summary.py:136-147)."""
    m = _HQ_RE.search(text)
    if not m or not m.group(1).strip():
        return (None, None, None)
    parts = [p.strip() for p in m.group(1).strip().split(",")]
    if len(parts) == 1:
        return (parts[0], None, None)
    if len(parts) == 2:
        return (parts[0], None, parts[1])
    return (parts[0], parts[1], ", ".join(parts[2:]))


@given(
    st.lists(
        st.tuples(
            st.lists(
                st.text(alphabet="abc xyz", min_size=1, max_size=8),
                min_size=1,
                max_size=4,
            ),
            st.booleans(),  # trailing sentence or end-of-string
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_extract_headquarters_matches_python_model(spark, cases):
    from etl_8million_data__spark.functions.scalars import extract_headquarters

    vals = [
        "Acme Corp is headquartered in "
        + ", ".join(p.strip() or "x" for p in parts)
        + (". It makes things." if tail else "")
        for parts, tail in cases
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    city, state, country = extract_headquarters(F.col("v"))
    out = df.select(
        city.alias("city"), state.alias("state"), country.alias("country")
    ).collect()
    for v, r in zip(vals, out):
        assert (r["city"], r["state"], r["country"]) == _hq_model(v), v
