"""Equivalence of the two as-of join formulations (ranking fan-out vs
merge-sorted running-last) plus edge cases the fixture can't hit:
right-ts ties, null columns in the winning right row (struct
atomicity), no-match probes, null by-keys."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.asof import (
    asof_join_backward,
    asof_join_backward_sorted,
)

SF = "/root/testdata/sf0.001"


def _both(left, right, **kw):
    a = asof_join_backward(left, right, **kw)
    b = asof_join_backward_sorted(left, right, **kw)
    return a, b


def test_fixture_equivalence(spark):
    e = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    kw = dict(
        by=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        left_id="event_id",
        right_cols=["o_orderkey", "o_orderdate"],
        right_tiebreak="o_orderkey",
    )
    a, b = _both(e, o, **kw)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_edges_tie_null_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-02T00:00:00")),  # tie: two right rows at its ts
            (2, 7, _ts("2024-01-01T00:00:00")),  # exact-ts inclusive match
            (3, 7, _ts("2023-12-31T00:00:00")),  # before all rights: dropped
            (4, None, _ts("2024-01-05T00:00:00")),  # null key: dropped
            (5, 8, _ts("2024-01-04T00:00:00")),  # winner carries a NULL col
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01T00:00:00"), 100, "a"),
            (7, _ts("2024-01-02T00:00:00"), 200, "b"),
            (7, _ts("2024-01-02T00:00:00"), 300, "c"),  # tiebreak winner
            (8, _ts("2024-01-03T00:00:00"), 400, "d"),
            (8, _ts("2024-01-04T00:00:00"), 500, None),  # later but null payload
        ],
        "user_id long, rts timestamp, rk long, payload string",
    )
    kw = dict(
        by=["user_id"],
        left_ts="ts",
        right_ts="rts",
        left_id="event_id",
        right_cols=["rk", "payload"],
        right_tiebreak="rk",
    )
    a, b = _both(left, right, **kw)
    got_a = {r.event_id: (r.rk, r.payload) for r in a.collect()}
    got_b = {r.event_id: (r.rk, r.payload) for r in b.collect()}
    expected = {
        1: (300, "c"),  # tiebreak-desc winner among tied ts
        2: (100, "a"),  # inclusive backward match
        5: (500, None),  # whole-row pick: payload stays None, not "d"
    }
    assert got_a == expected
    assert got_b == expected


def test_null_timestamps_match_ranking_form(spark):
    """NULL right_ts never satisfies right_ts <= left_ts in the ranking
    form; the sorted form must not carry a null-ts build row forward as
    a match, and a NULL left_ts probe must be dropped by both."""
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-05T00:00:00")),  # only null-ts right rows: no match
            (2, 7, None),  # null probe ts: dropped
            (3, 8, _ts("2024-01-05T00:00:00")),  # real match exists
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, None, 100, "null-ts"),
            (8, None, 200, "null-ts"),
            (8, _ts("2024-01-01T00:00:00"), 300, "real"),
        ],
        "user_id long, rts timestamp, rk long, payload string",
    )
    kw = dict(
        by=["user_id"],
        left_ts="ts",
        right_ts="rts",
        left_id="event_id",
        right_cols=["rk", "payload"],
        right_tiebreak="rk",
    )
    a, b = _both(left, right, **kw)
    expected = {3: (300, "real")}
    assert {r.event_id: (r.rk, r.payload) for r in a.collect()} == expected
    assert {r.event_id: (r.rk, r.payload) for r in b.collect()} == expected


def test_interval_count_keeps_null_key_probes(spark):
    """LEFT JOIN semantics: a probe with a NULL by-key matches nothing
    but is KEPT with a 0 count (as the equi+range-filter left join
    would), not silently dropped."""
    from etl_8million_data__spark.operators.asof import interval_count_backward

    probes = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T01:30:00")),
            (2, None, _ts("2024-01-01T01:30:00")),  # null key
        ],
        "purchase_id long, user_id long, ts timestamp",
    )
    events = spark.createDataFrame(
        [
            (7, _ts("2024-01-01T01:00:00")),
            (None, _ts("2024-01-01T01:00:00")),  # null-key event: never counted
        ],
        "user_id long, ts timestamp",
    )
    got = {
        r.purchase_id: r.n_in_window
        for r in interval_count_backward(
            probes, events, ["user_id"], "ts", "ts", "purchase_id"
        ).collect()
    }
    assert got == {1: 1, 2: 0}
