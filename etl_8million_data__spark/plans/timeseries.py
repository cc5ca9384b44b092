"""Event-time window queries over the events table (SURVEY.md §7.2(4):
the streaming vocabulary, batch-first). The same builders are wrapped
as Structured Streaming jobs in ``streaming/``; these batch forms carry
the DuckDB oracles (time_bucket / offset cross-join / gaps-and-islands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.operators.asof import (
    asof_join_backward,
    asof_join_backward_sorted,
)
from etl_8million_data__spark.plans.registry import register


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           sum({sql_cents('value')}) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("timeseries", "window", "streaming-vocab"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows — the batch form of the
    canonical streaming aggregation (watermarked twin in streaming/)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
            "total_value",
        )
    )


@register(
    "events_sliding_halfhour",
    oracle=f"""
    SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off * INTERVAL 30 MINUTE
             AS window_start,
           count(*) AS n_events,
           sum({sql_cents('value')}) / 100.0 AS total_value
    FROM events CROSS JOIN (SELECT unnest(range(2)) AS off) o
    GROUP BY 1
    """,
    tags=("timeseries", "window", "sliding"),
)
def events_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour span, 30 min slide): each event lands in
    span/slide = 2 windows; the oracle materializes that via an offset
    cross-join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "events_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("timeseries", "session-window"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap. Spark's
    session_window end = last event + gap; the oracle reproduces the
    merge rule via gaps-and-islands."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "events_hourly_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events),
    hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
              FROM bounds),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour_start,
             count(*) AS n_events,
             sum({sql_cents('value')}) / 100.0 AS total_value
      FROM events GROUP BY 1)
    SELECT h.hour_start,
           coalesce(a.n_events, 0) AS n_events,
           coalesce(a.total_value, 0.0) AS total_value
    FROM hours h LEFT JOIN agg a ON a.hour_start = h.hour_start
    """,
    tags=("timeseries", "gapfill"),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with zero-filled gaps: sequence() over the
    observed bound, left join the hourly aggregate. The generated spine
    is tiny; only the aggregate shuffles."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    agg = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents("value")) / 100.0).alias("total_value"),
    )
    return hours.join(agg, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@register(
    "events_user_ema",
    oracle="""
    WITH ordered AS (
      SELECT user_id, value
      FROM events
      ORDER BY user_id, ts, event_id),
    vals AS (
      SELECT user_id, list(value) AS vs
      FROM ordered GROUP BY user_id)
    SELECT user_id,
           len(vs) AS n_events,
           list_reduce(vs, (acc, v) -> 0.1 * v + 0.9 * acc) AS ema_value
    FROM vals
    """,
    tags=("timeseries", "stateful", "ema"),
)
def events_user_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running EMA (alpha=0.1) over time-ordered values — the
    batch twin of the applyInPandasWithState operator
    (streaming/stateful.py). Implemented as an ordered-array fold so
    the accumulation order (and thus every FP bit) is pinned on both
    engines. DuckDB's list() preserves the ORDER BY of the inlined
    subquery; Spark sorts (ts, event_id, value) structs explicitly."""
    e = load_table(spark, sf_dir, "events")
    vals = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("vs")
    )
    ema = F.aggregate(
        F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at("vs", 1),
        lambda acc, v: F.lit(0.1) * v + F.lit(0.9) * acc,
    )
    return vals.select(
        "user_id", F.size("vs").cast("bigint").alias("n_events"), ema.alias("ema_value")
    )


@register(
    "events_asof_latest_order",
    oracle="""
    SELECT event_id, user_id, ts, o_orderkey, o_orderdate
    FROM (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    WHERE rn = 1
    """,
    tags=("timeseries", "asof-join"),
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks the customer's latest
    order at event time (user_id ≡ custkey in the fixtures).  Uses the
    merge-sorted formulation (union + running last): one sort per user
    partition, no event×order fan-out — the plan that survives
    high-frequency build sides at 100 TB.  The generic ranking form
    (asof_join_backward) is equivalence-tested against it."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return asof_join_backward_sorted(
        e,
        o,
        by=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        left_id="event_id",
        right_cols=["o_orderkey", "o_orderdate"],
        right_tiebreak="o_orderkey",
    )


@register(
    "events_click_attribution_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           count(c.ts) AS n_clicks_1h
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    tags=("timeseries", "range-join", "extension"),
)
def events_click_attribution_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (attribution shape): for every purchase,
    count the same user's clicks in the preceding hour.  Uses the
    merge-sorted running-count formulation
    (operators/asof.interval_count_backward): each purchase becomes two
    signed bound rows and the window count is a running-sum difference
    — 2|P|+|C| rows per user partition instead of the equi+range-filter
    join's |P|×|C| fan-out on hot users.  Purchases with no clicks
    still appear (their bounds always exist).  The streaming twin is
    the watermarked stream-stream join (streaming/jobs.py
    click_purchase_pairs_stream)."""
    from etl_8million_data__spark.operators.asof import interval_count_backward

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("click_ts"))
    return interval_count_backward(
        p,
        c,
        by=["user_id"],
        probe_ts="purchase_ts",
        event_ts="click_ts",
        probe_id="purchase_id",
        window_expr="INTERVAL 1 HOUR",
        out_col="n_clicks_1h",
    )


@register(
    "events_rollup_daily_from_hourly",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
           count(*) AS n_events,
           CAST(sum({sql_cents('value')}) AS BIGINT) AS sum_value_cents,
           max(value) AS max_value
    FROM events GROUP BY day_start, event_type
    """,
    tags=("timeseries", "rollup", "hypertable", "extension"),
)
def events_rollup_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: day-grain totals computed
    by RE-AGGREGATING the materialized hour rollup (sums of partial
    sums), never the raw events — the oracle aggregates raw directly,
    so an exact match proves the algebraic merge. operators/rollup.py
    adds O(affected-buckets) late-data refresh."""
    from etl_8million_data__spark.operators.rollup import hourly_rollup, reaggregate_daily

    return reaggregate_daily(hourly_rollup(load_table(spark, sf_dir, "events")))


@register(
    "events_ohlc_hourly",
    oracle=f"""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
             event_type, ts, event_id,
             {sql_cents('value')} AS vc
      FROM events),
    r AS (
      SELECT hour_start, event_type, vc,
             row_number() OVER (PARTITION BY hour_start, event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY hour_start, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b)
    SELECT hour_start, event_type,
           max(CASE WHEN rn_a = 1 THEN vc END) / 100.0 AS open,
           max(vc) / 100.0 AS high,
           min(vc) / 100.0 AS low,
           max(CASE WHEN rn_d = 1 THEN vc END) / 100.0 AS close,
           count(*) AS n_events,
           CAST(sum(vc) AS BIGINT) / 100.0 AS total_value
    FROM r
    GROUP BY hour_start, event_type
    """,
    tags=("timeseries", "ohlc", "resample", "extension"),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the finance resample the
    reference's stock domain implies (quote history -> bars).  Open and
    close are the first/last value by the total order (ts, event_id),
    so ties are deterministic in both engines; prices go through
    integer cents, making every aggregate bit-exact.  One window + one
    aggregate sharing the same (hour, type) partitioning — a single
    exchange; at 100 TB the key space is hours x types, so partials
    collapse map-side."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        F.window("ts", "1 hour").getField("start").alias("hour_start"),
        "event_type",
        "ts",
        "event_id",
        cents("value").alias("vc"),
    )
    asc = Window.partitionBy("hour_start", "event_type").orderBy("ts", "event_id")
    desc = Window.partitionBy("hour_start", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = b.select(
        "hour_start",
        "event_type",
        "vc",
        F.row_number().over(asc).alias("rn_a"),
        F.row_number().over(desc).alias("rn_d"),
    )
    return r.groupBy("hour_start", "event_type").agg(
        (F.max(F.when(F.col("rn_a") == 1, F.col("vc"))) / 100.0).alias("open"),
        (F.max("vc") / 100.0).alias("high"),
        (F.min("vc") / 100.0).alias("low"),
        (F.max(F.when(F.col("rn_d") == 1, F.col("vc"))) / 100.0).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("vc").cast("bigint") / 100.0).alias("total_value"),
    )


@register(
    "events_scd2_type_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    seg AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seg_no
      FROM ordered),
    g AS (
      SELECT user_id, seg_no, min(event_type) AS event_type,
             min(ts) AS valid_from, max(ts) AS last_ts,
             count(*) AS n_events
      FROM seg GROUP BY user_id, seg_no)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           last_ts,
           n_events,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY valid_from) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM g
    """,
    tags=("timeseries", "scd2", "temporal", "extension"),
)
def events_scd2_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) interval build from a
    change log: per user, consecutive repeats of event_type collapse
    into one validity interval [valid_from, valid_to) with valid_to =
    next interval's start and NULL marking the current row — the
    standard islands-and-gaps construction (change flag via lag ->
    running-sum segment number -> per-segment min/count -> lead for the
    interval end). Every window is partitioned by user_id with a
    (ts, event_id) total order: no global windows, no skewed single
    partition, deterministic under replay — this is how a temporal
    dimension table is maintained relationally at any scale."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1,
    ).otherwise(0)
    seg = e.withColumn("_chg", chg).withColumn(
        "seg_no",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = seg.groupBy("user_id", "seg_no").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w2)
    return g.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "last_ts",
        "n_events",
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "events_scd2_incremental",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    seg AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seg_no
      FROM ordered),
    g AS (
      SELECT user_id, seg_no, min(event_type) AS event_type,
             min(ts) AS valid_from, max(ts) AS last_ts,
             count(*) AS n_events
      FROM seg GROUP BY user_id, seg_no)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           last_ts,
           n_events,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY valid_from) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM g
    """,
    tags=("timeseries", "scd2", "temporal", "incremental", "extension",
          "persisted-view"),
)
def events_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 maintenance (operators/scd2.py) — the
    temporal-dimension door of the maintenance family: the interval
    table is initialized from the FIRST HALF of the change history
    (events at or before the time-range midpoint), the second half then
    absorbs via :func:`scd2_apply` — only the batch keys' buckets are
    read, only their CURRENT open intervals re-derive (the current row
    re-enters the islands pass as one weighted pseudo-event, so seam
    extension vs closure falls out of the same code path), closed
    history is value-preserved — and the final table is read back.
    Proven by equivalence: the oracle is the one-shot islands build
    over ALL events (split-independence IS the correctness claim, the
    refresh_join_view / golden_increment discipline). Late-data safety:
    a batch change at or before a key's open interval start raises
    loudly instead of splicing wrong intervals (order contract,
    tests/test_scd2.py)."""
    import shutil

    from etl_8million_data__spark.operators.scd2 import (
        read_intervals,
        scd2_apply,
        scd2_init,
    )
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        "ts",
        F.col("event_type").alias("attr"),
    )
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    cutoff = lo + (hi - lo) / 2
    root = _persisted_index_root(sf_dir, "scd2_incr")
    shutil.rmtree(root, ignore_errors=True)
    scd2_init(e.filter(F.col("ts") <= F.lit(cutoff)), root)
    scd2_apply(spark, root, e.filter(F.col("ts") > F.lit(cutoff)))
    return read_intervals(spark, root).select(
        F.col("key").alias("user_id"),
        F.col("attr").alias("event_type"),
        "valid_from",
        "valid_to",
        "last_ts",
        "n_events",
        "is_current",
    )


@register(
    "events_concurrent_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, event_type, ts,
             sum(new_session) OVER (
               PARTITION BY user_id, event_type ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    iv AS (
      SELECT user_id, event_type, min(ts) AS s, max(ts) AS e
      FROM numbered GROUP BY user_id, event_type, sid)
    SELECT a.user_id,
           a.event_type AS type_a, b.event_type AS type_b,
           a.s AS start_a, a.e AS end_a, b.s AS start_b, b.e AS end_b,
           epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s))
             AS overlap_us
    FROM iv a
    JOIN iv b ON b.user_id = a.user_id
             AND a.event_type < b.event_type
             AND a.s <= b.e AND b.s <= a.e
    """,
    tags=("timeseries", "interval-join", "extension", "scale-path"),
)
def events_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP JOIN — the time-range join Spark has no native
    operator for, done scalably via time-bucket binning: sessionize
    each (user, event_type) timeline (2-hour gap islands), then find
    every pair of DIFFERENT-type sessions of the same user whose time
    spans overlap — concurrent-activity detection.  A naive same-user
    interval self-join fans out |sessions_u|² per user; instead each
    interval explodes into the 1-hour buckets it spans and the join is
    EQUI on (user_id, bucket) with the overlap predicate inline — the
    standard partitioned-binning interval join, whose fan-out is
    span/bucket rows per interval and whose shuffle is uniformly
    keyed.  A pair overlapping several shared buckets collapses via
    distinct on the interval endpoints themselves.  Overlap durations
    are exact integer microseconds (timestampdiff ⇔ epoch_us on the
    same TIMESTAMP_NTZ instants — no epoch extraction, so no session-
    timezone dependence); touching intervals (overlap_us = 0) count as
    concurrent, matching the closed-interval oracle predicate."""
    e = load_table(spark, sf_dir, "events")
    return concurrent_sessions_frame(e)


def concurrent_sessions_frame(e: DataFrame) -> DataFrame:
    """Frame-level core of events_concurrent_sessions (also driven by
    the adversarial hot-user probe in tools/scaling_probe.py).

    MULTI-RESOLUTION binning: a single-resolution hour grid makes an
    interval's fan-out span-proportional at 24 rows/day — fine for the
    realistic tail (a month-long fused session is ~720 rows, probed),
    a cliff for pathological years-long intervals (10k+ rows each).
    So intervals are split by span: SHORT intervals (< 2 days) explode
    into hour buckets, LONG intervals into day buckets, and candidates
    are the union of two equi-joins — short x short on (user, hour) and
    any-long pairs on (user, day), where short intervals contribute
    their <= 3 day rows to the day-keyed side. A years-long interval
    now fans out 365 rows/year instead of 8,760, while dense same-day
    short sessions keep the fine hour key that keeps their candidate
    groups small. Both joins dedup via distinct on the interval
    endpoints before the exact overlap predicate — the result set is
    identical to single-resolution binning (and to the oracle's naive
    self-join). The same construction extends upward (week/month
    buckets) if spans ever warrant a third level."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 2 HOUR")),
        1,
    ).otherwise(0)
    wrun = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = e.select(
        "user_id", "event_type", "ts", new_s.alias("new_session")
    ).select(
        "user_id", "event_type", "ts", F.sum("new_session").over(wrun).alias("sid")
    )
    iv = numbered.groupBy("user_id", "event_type", "sid").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    is_long = F.col("e") >= F.date_trunc("day", F.col("s")) + F.expr("INTERVAL 2 DAY")
    # one interval row per session, materialized once: three join inputs
    # (short-hour a/b, long-day probe, all-day build) derive from it, and
    # each would otherwise replay the sessionization windows
    iv = iv.select(
        "user_id", "event_type", "s", "e", is_long.alias("is_long")
    ).localCheckpoint(eager=True)

    def binned(df: DataFrame, unit: str) -> DataFrame:
        return df.select(
            "user_id",
            "event_type",
            "s",
            "e",
            "is_long",
            F.explode(
                F.sequence(
                    F.date_trunc(unit, "s"),
                    F.date_trunc(unit, "e"),
                    F.expr(f"INTERVAL 1 {unit.upper()}"),
                )
            ).alias("bucket"),
        )

    def sides(df: DataFrame):
        a = df.select(
            "user_id",
            "bucket",
            F.col("is_long").alias("long_a"),
            F.col("event_type").alias("type_a"),
            F.col("s").alias("start_a"),
            F.col("e").alias("end_a"),
        )
        b = df.select(
            "user_id",
            "bucket",
            F.col("is_long").alias("long_b"),
            F.col("event_type").alias("type_b"),
            F.col("s").alias("start_b"),
            F.col("e").alias("end_b"),
        )
        return a, b

    cols = ["user_id", "type_a", "type_b", "start_a", "end_a", "start_b", "end_b"]
    # fine resolution: short intervals only, keyed on (user, hour); both
    # orientations of a pair appear, keep the canonical one
    ha, hb = sides(binned(iv.filter(~F.col("is_long")), "hour"))
    cand_hour = (
        ha.join(hb, ["user_id", "bucket"])
        .filter(F.col("type_a") < F.col("type_b"))
        .select(*cols)
    )
    # coarse resolution: the probe ('a') side is LONG intervals ONLY —
    # pre-filtering the join input instead of post-filtering its output
    # (a long_a|long_b residual after an all x all day join would build
    # every same-day candidate first; with no long intervals this join
    # is now empty and free). The build side is every interval's day
    # buckets (short ones add <= 3 rows), so long x long and
    # long x short pairs both surface; orientation is canonicalized
    # afterwards because only one side carries the long rows.
    da, _ = sides(binned(iv.filter(F.col("is_long")), "day"))
    _, db = sides(binned(iv, "day"))
    swap = F.col("type_a") > F.col("type_b")

    def pick(a_col: str, b_col: str):
        return F.when(swap, F.col(b_col)).otherwise(F.col(a_col))

    cand_day = (
        da.join(db, ["user_id", "bucket"])
        .filter(F.col("type_a") != F.col("type_b"))
        .select(
            "user_id",
            pick("type_a", "type_b").alias("type_a"),
            pick("type_b", "type_a").alias("type_b"),
            pick("start_a", "start_b").alias("start_a"),
            pick("end_a", "end_b").alias("end_a"),
            pick("start_b", "start_a").alias("start_b"),
            pick("end_b", "end_a").alias("end_b"),
        )
    )
    pairs = (
        cand_hour.unionByName(cand_day)
        .filter(
            (F.col("start_a") <= F.col("end_b"))
            & (F.col("start_b") <= F.col("end_a"))
        )
        .distinct()
    )
    return pairs.select(
        "user_id",
        "type_a",
        "type_b",
        "start_a",
        "end_a",
        "start_b",
        "end_b",
        F.expr(
            "timestampdiff(MICROSECOND, greatest(start_a, start_b),"
            " least(end_a, end_b))"
        ).alias("overlap_us"),
    )


@register(
    "events_hourly_cusum_drift",
    oracle="""
    WITH hr AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS total
      FROM hr GROUP BY 1),
    ordered AS (
      SELECT hr.event_type, t.n, t.total, list(hr.x ORDER BY hr.h) AS xs
      FROM hr JOIN tot t USING (event_type)
      GROUP BY hr.event_type, t.n, t.total),
    folded AS (
      SELECT event_type, n, total,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)], 
                 list_transform(xs, x -> [x, CAST(0 AS BIGINT)])),
               (acc, e) -> [
                 greatest(CAST(0 AS BIGINT), acc[1] + e[1] * n - total),
                 greatest(acc[2],
                   greatest(CAST(0 AS BIGINT), acc[1] + e[1] * n - total))
               ]) AS st
      FROM ordered)
    SELECT event_type, n AS n_hours, total AS total_events,
           st[2] AS max_cusum_scaled,
           st[2] * 1.0 / n AS max_cusum_events
    FROM folded
    """,
    tags=("timeseries", "monitoring", "cusum", "extension"),
)
def events_hourly_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-drift detection via a CUSUM statistic over each event
    type's hourly counts: S_i = max(0, S_{i-1} + (x_i − mean)) with
    the peak S reported — the classic change-point monitor that
    accumulates small sustained shifts a 3-sigma spike test never
    sees.  EXACT integer arithmetic: deviations are scaled by the hour
    count (n·x_i − total avoids the rational mean), the fold carries
    (S, max S) as a 2-element bigint array in hour order — the same
    pinned-accumulation-order technique as the EMA fold — and only the
    final per-type statistic divides once for the events-unit
    rendering.  Shape at scale: one hour-keyed aggregate, one
    type-keyed aggregate, one bounded per-type ordered fold (array
    length = hours in window)."""
    hr = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    tot = hr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("total")
    )
    ordered = (
        hr.join(tot, "event_type")
        .groupBy("event_type", "n", "total")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("h", "x"))),
                lambda s: s["x"],
            ).alias("xs")
        )
    )
    zero = F.lit(0).cast("bigint")
    folded = ordered.select(
        "event_type",
        "n",
        "total",
        F.aggregate(
            F.col("xs"),
            F.array(zero, zero),
            lambda acc, x: F.array(
                F.greatest(
                    zero, acc.getItem(0) + x * F.col("n") - F.col("total")
                ),
                F.greatest(
                    acc.getItem(1),
                    F.greatest(
                        zero, acc.getItem(0) + x * F.col("n") - F.col("total")
                    ),
                ),
            ),
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("total").alias("total_events"),
        F.col("st").getItem(1).alias("max_cusum_scaled"),
        (F.col("st").getItem(1) * 1.0 / F.col("n")).alias("max_cusum_events"),
    )


@register(
    "events_scd2_pointintime_join",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, ts, event_type
      FROM events WHERE event_type <> 'purchase'),
    marked AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    iv AS (
      SELECT user_id, CAST(sid AS BIGINT) AS seg_no,
             min(event_type) AS state, min(ts) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM numbered GROUP BY user_id, sid),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, iv.state, iv.valid_from, iv.n_events
    FROM p JOIN iv ON iv.user_id = p.user_id AND iv.valid_from <= p.ts
    QUALIFY row_number() OVER (
      PARTITION BY p.event_id
      ORDER BY iv.valid_from DESC, iv.seg_no DESC) = 1
    """,
    tags=("timeseries", "scd2", "asof", "temporal", "extension", "scale-path"),
)
def events_scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME dimension join — the feature-store / temporal
    star-schema primitive: every purchase event is joined to the SCD2
    state interval of its user valid AT THE PURCHASE INSTANT (the
    user's last non-purchase activity segment), never to a later one
    (no feature leakage). Because SCD2 intervals partition each user's
    timeline (valid_to = next valid_from), validity reduces to
    "greatest valid_from <= probe ts" — an AS-OF join, executed with
    the merge-sorted operator (one sort per user partition over
    |probes|+|intervals| rows, no probe x interval fan-out; same shape
    as events_asof_latest_order). The oracle is the naive
    interval-predicate join + rank."""
    e = load_table(spark, sf_dir, "events")
    d = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1,
    ).otherwise(0)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = (
        d.withColumn("_chg", chg)
        .withColumn("seg_no", F.sum("_chg").over(wrun))
        .groupBy("user_id", "seg_no")
        .agg(
            F.min("event_type").alias("state"),
            F.min("ts").alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", F.col("seg_no").cast("bigint").alias("seg_no"),
                "state", "valid_from", "n_events")
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join_backward_sorted(
        probes,
        iv,
        by=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        left_id="event_id",
        right_cols=["state", "valid_from", "n_events"],
        right_tiebreak="seg_no",
    )


@register(
    "events_holt_linear_forecast",
    oracle="""
    WITH hr AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                 date_trunc('hour', max(ts)) AS hi FROM events),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM b) g),
    xs AS (
      SELECT s.event_type,
             list(CAST(coalesce(hr.x, 0) AS DOUBLE) ORDER BY s.h) AS v
      FROM spine s LEFT JOIN hr
        ON hr.event_type = s.event_type AND hr.h = s.h
      GROUP BY 1),
    f AS (
      SELECT event_type, len(v) AS n,
             list_reduce(
               list_prepend([v[1], v[2] - v[1]],
                            list_transform(v[3:], x -> [x, 0.0])),
               (st, e) -> [
                 0.2 * e[1] + 0.8 * (st[1] + st[2]),
                 0.1 * ((0.2 * e[1] + 0.8 * (st[1] + st[2])) - st[1])
                   + 0.9 * st[2]
               ]) AS st
      FROM xs WHERE len(v) >= 2)
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS fc_1h,
           st[1] + 2 * st[2] AS fc_2h,
           st[1] + 3 * st[2] AS fc_3h
    FROM f
    """,
    tags=("timeseries", "forecast", "extension"),
)
def events_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing per event type — the
    capacity-planning forecast over the zero-filled hourly series:
    level/trend recursion (alpha=0.2, beta=0.1, init l0=x0,
    b0=x1-x0) as an ORDERED ARRAY FOLD so the accumulation order —
    and hence every FP bit — is pinned on both engines (the
    events_user_ema contract, extended to 2-component state via a
    struct accumulator). Forecasts are the linear extrapolation
    level + h*trend for h = 1..3 hours. The per-type series is dense:
    a global hour spine (2 scalar bounds, broadcast) left-joined by
    (type, hour), so silent gaps read as zeros instead of skipped
    steps. One aggregation keyed by type; the fold is |hours| work per
    type, never a data-sized window."""
    e = load_table(spark, sf_dir, "events")
    hr = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    xs = (
        spine.join(hr, ["event_type", "h"], "left")
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("h"),
                            F.coalesce("x", F.lit(0)).cast("double").alias("x"),
                        )
                    )
                ),
                lambda s: s["x"],
            ).alias("v")
        )
        .filter(F.size("v") >= 2)
    )
    init = F.struct(
        F.element_at("v", 1).alias("l"),
        (F.element_at("v", 2) - F.element_at("v", 1)).alias("b"),
    )

    def step(st, x):
        lp = F.lit(0.2) * x + F.lit(0.8) * (st["l"] + st["b"])
        return F.struct(
            lp.alias("l"),
            (F.lit(0.1) * (lp - st["l"]) + F.lit(0.9) * st["b"]).alias("b"),
        )

    st = F.aggregate(
        F.slice(F.col("v"), 3, F.greatest(F.size("v") - 2, F.lit(0))), init, step
    )
    return xs.select(
        "event_type",
        F.size("v").cast("bigint").alias("n_hours"),
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"]).alias("fc_1h"),
        (st["l"] + 2 * st["b"]).alias("fc_2h"),
        (st["l"] + 3 * st["b"]).alias("fc_3h"),
    )


@register(
    "events_seasonal_hod_anomalies",
    oracle="""
    WITH hr AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                 date_trunc('hour', max(ts)) AS hi FROM events),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM b) g),
    dense AS (
      SELECT s.event_type, s.h, hour(s.h) AS hod, coalesce(hr.x, 0) AS x
      FROM spine s LEFT JOIN hr
        ON hr.event_type = s.event_type AND hr.h = s.h),
    base AS (
      SELECT event_type, hod,
             CAST(count(*) AS BIGINT) AS n_obs,
             (1000000 * CAST(sum(x) AS BIGINT)) // count(*) AS baseline_micro
      FROM dense GROUP BY 1, 2)
    SELECT d.event_type, d.h AS hour_ts, CAST(d.hod AS INT) AS hod,
           d.x AS n_events, b.baseline_micro,
           1000000 * d.x - b.baseline_micro AS deviation_micro
    FROM dense d JOIN base b
      ON b.event_type = d.event_type AND b.hod = d.hod
    WHERE 2 * 1000000 * d.x > 3 * b.baseline_micro
       OR 2 * 1000000 * d.x < b.baseline_micro
    """,
    tags=("timeseries", "monitoring", "seasonal", "extension"),
)
def events_seasonal_hod_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-BASELINE anomaly detection — the monitoring view the
    global detectors (z-score, MAD, CUSUM) structurally miss: traffic
    has an hour-of-day shape, so "low for 3am" and "low for 3pm" are
    different events. Baseline = per (type, hour-of-day) mean hourly
    count over the dense zero-filled series (silent dead hours drag
    the baseline down instead of being invisible); a concrete hour is
    flagged when its count leaves the [0.5x, 1.5x] band of its own
    hour-of-day baseline — both bounds as pure integer-micro
    predicates, no division in the filter. One aggregate for the
    24x|types| baseline table, joined back to the dense series on
    (type, hod)."""
    e = load_table(spark, sf_dir, "events")
    hr = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    dense = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(hours))
        .join(hr, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.hour("h").alias("hod"),
            F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
        )
    )
    base = dense.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.expr("(1000000 * sum(x)) div count(1)").alias("baseline_micro"),
    )
    j = dense.join(F.broadcast(base), ["event_type", "hod"])
    return j.filter(
        (2 * 1_000_000 * F.col("x") > 3 * F.col("baseline_micro"))
        | (2 * 1_000_000 * F.col("x") < F.col("baseline_micro"))
    ).select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.col("hod").cast("int").alias("hod"),
        F.col("x").alias("n_events"),
        "baseline_micro",
        (1_000_000 * F.col("x") - F.col("baseline_micro")).alias("deviation_micro"),
    )


@register(
    "events_user_interarrival_stats",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events),
    gaps AS (
      SELECT user_id,
             CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) // 1000000 AS gap_s
      FROM ordered WHERE prev_ts IS NOT NULL),
    arr AS (
      SELECT user_id, list(gap_s ORDER BY gap_s) AS g
      FROM gaps GROUP BY user_id),
    sel AS (
      SELECT user_id, len(g) AS n_gaps,
             g[(len(g) - 1) // 2 + 1] AS median_gap_s,
             g[(9 * (len(g) - 1)) // 10 + 1] AS p90_gap_s
      FROM arr WHERE len(g) >= 2)
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           median_gap_s, p90_gap_s,
           (1000000 * p90_gap_s) // greatest(median_gap_s, 1)
             AS burstiness_micro
    FROM sel
    """,
    tags=("timeseries", "behavioral", "extension"),
)
def events_user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user INTERARRIVAL profile — the behavioral signal
    sessionization thresholds and bot detection are tuned from: the
    gaps between a user's consecutive events (integer seconds from
    exact epoch-microsecond differences), summarized as discrete
    median and p90 picked by EXPLICIT integer rank from the sorted gap
    array (the winsorized-stats discipline: no engine percentile
    semantics load-bearing), plus a burstiness ratio p90/median in
    truncating integer micro — heavy-tailed users (bursts + long
    silences) score high, metronomic ones near 1. One user-keyed
    window for the lag, one per-user aggregate; array length = that
    user's event count, never data-sized."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select("user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, prev_ts, ts) div 1000000"
            ).alias("gap_s"),
        )
    )
    arr = gaps.groupBy("user_id").agg(F.array_sort(F.collect_list("gap_s")).alias("g"))
    n = F.size("g")
    sel = arr.filter(n >= 2).select(
        "user_id",
        n.cast("bigint").alias("n_gaps"),
        F.element_at("g", ((n - 1) / 2).cast("int") + 1).alias("median_gap_s"),
        F.element_at("g", (9 * (n - 1) / 10).cast("int") + 1).alias("p90_gap_s"),
    )
    return sel.select(
        "user_id",
        "n_gaps",
        "median_gap_s",
        "p90_gap_s",
        F.expr(
            "(1000000 * p90_gap_s) div greatest(median_gap_s, 1)"
        ).alias("burstiness_micro"),
    )


@register(
    "events_multitouch_attribution",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    pairs AS (
      SELECT p.purchase_id, c.click_id
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts),
    np AS (SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_p
           FROM pairs GROUP BY 1)
    SELECT click_id,
           CAST(count(*) AS BIGINT) AS n_purchases_touched,
           CAST(sum(1000000 // n_p) AS BIGINT) AS credit_micro
    FROM pairs JOIN np USING (purchase_id)
    GROUP BY click_id
    """,
    tags=("timeseries", "attribution", "behavioral", "extension"),
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TOUCH attribution — the credit-assignment layer on top of
    the range-join family: every purchase splits one unit of credit
    EQUALLY (1e6 div n, truncating — integer-exact in both engines)
    across the same user's clicks in the preceding hour, and each click
    reports its accumulated credit and how many purchases it touched.
    This is the pair-valued sibling of
    events_click_attribution_range_join: counting per purchase
    collapses to signed bounds (no pair materialization), but CREDIT
    lands on the click side, so the (purchase, click) pairs genuinely
    exist in the output's provenance and the join materializes them —
    bounded by Σ_u |P_u|·|C_u within window|, keyed by user (a hot
    user's fan-out spreads under the binned-key discipline of
    events_concurrent_sessions if it ever dominates).

    Scale shape: one user-keyed equi join with a range predicate, two
    hash aggregates (per-purchase touch count — broadcastable, it is
    |P|-sized — then per-click credit); direct conversions (purchases
    with zero prior clicks) contribute no rows by definition of
    credit."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    pairs = (
        p.join(c, "user_id")
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .select("purchase_id", "click_id")
        .localCheckpoint(eager=True)
    )
    np_ = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p")
    )
    return (
        pairs.join(F.broadcast(np_), "purchase_id")
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases_touched"),
            F.sum(F.expr("1000000 div n_p")).cast("bigint").alias("credit_micro"),
        )
    )
