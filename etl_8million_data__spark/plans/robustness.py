"""Robustness / scale-technique queries: salted aggregation over hot
keys (exactness proven against the plain-groupBy oracle) and
reader-level malformed-JSON quarantine (§2.10 PERMISSIVE parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.operators.skew import salted_agg
from etl_8million_data__spark.plans.registry import register


@register(
    "skew_salted_event_type_totals",
    oracle=f"""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum({sql_cents('value')}) AS BIGINT) AS value_cents
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "salting", "agg", "scale"),
)
def skew_salted_event_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type has 5 values over all rows — maximal key skew. The
    salted two-phase aggregate must equal the plain GROUP BY exactly
    (the oracle is the plain form), proving the skew mitigation is
    semantics-preserving."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        key_cols=["event_type"],
        sum_cols={"value_cents": cents("value")},
        salt_buckets=16,
    )


@register(
    "json_quarantine_split",
    oracle="""
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0
                  THEN '{broken' || props ELSE props END AS payload
      FROM events)
    SELECT event_id,
           NOT json_valid(payload) AS quarantined,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract_string(payload, '$.k') AS INTEGER)
           END AS k
    FROM t
    """,
    tags=("json", "quarantine", "error-tolerance"),
)
def json_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reader-level error quarantine (details.py:136-137 / PERMISSIVE
    mode parity): corrupt every 10th payload, parse with from_json and
    a columnNameOfCorruptRecord — the corrupt column captures the raw
    text (quarantine), good rows parse normally, and no exception ever
    reaches the job. (PERMISSIVE from_json yields a null-*fielded*
    struct for malformed input, so isNull() alone cannot detect it —
    the corrupt-record column is the canonical signal.)"""
    e = load_table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 10 == 0, F.concat(F.lit("{broken"), F.col("props"))
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        payload,
        "k int, _corrupt_record string",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return e.select(
        "event_id",
        parsed["_corrupt_record"].isNotNull().alias("quarantined"),
        parsed["k"].alias("k"),
    )


@register(
    "data_quality_expectations",
    oracle="""
    WITH t AS (
      SELECT count(*) AS n_rows,
        sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS v_qty,
        sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS v_disc,
        sum(CASE WHEN l_tax <= 0 THEN 1 ELSE 0 END) AS v_tax,
        sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_ship,
        sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price
      FROM lineitem)
    SELECT 'quantity_in_1_50' AS rule, CAST(v_qty AS BIGINT) AS n_violations, n_rows FROM t
    UNION ALL SELECT 'discount_le_5pct', CAST(v_disc AS BIGINT), n_rows FROM t
    UNION ALL SELECT 'tax_positive', CAST(v_tax AS BIGINT), n_rows FROM t
    UNION ALL SELECT 'shipdate_not_null', CAST(v_ship AS BIGINT), n_rows FROM t
    UNION ALL SELECT 'price_positive', CAST(v_price AS BIGINT), n_rows FROM t
    """,
    tags=("quality", "expectations", "extension"),
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation report: N declared constraints checked
    in ONE scan of the fact (conditional sums fold into a single
    hash-free aggregate — the oracle's UNION-ALL form would scan five
    times), then stack() unpivots the counters into a (rule,
    n_violations, n_rows) report. Hard invariants (quantity domain,
    non-null shipdate, positive price) sit alongside soft expectations
    that do fire (discount cap, nonzero tax), so the report proves it
    counts rather than just returning zeros."""
    li = load_table(spark, sf_dir, "lineitem")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        one(~F.col("l_quantity").between(1, 50)).alias("v_qty"),
        one(F.col("l_discount") > 0.05).alias("v_disc"),
        one(F.col("l_tax") <= 0).alias("v_tax"),
        one(F.col("l_shipdate").isNull()).alias("v_ship"),
        one(F.col("l_extendedprice") <= 0).alias("v_price"),
    )
    return agg.select(
        F.expr(
            "stack(5,"
            " 'quantity_in_1_50', v_qty,"
            " 'discount_le_5pct', v_disc,"
            " 'tax_positive', v_tax,"
            " 'shipdate_not_null', v_ship,"
            " 'price_positive', v_price) as (rule, n_violations)"
        ),
        "n_rows",
    )


@register(
    "integrity_fk_orphans",
    oracle="""
    SELECT 'orders.o_custkey -> customer' AS edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_children,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    """,
    tags=("quality", "integrity", "audit", "extension"),
)
def integrity_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema — the data-
    contract check a warehouse runs after every load: for each foreign-
    key edge, the child row count and the number of ORPHANS (children
    whose parent key is missing), computed as LEFT-ANTI join counts.
    Each edge is one anti join against a parent KEY PROJECTION:
    dimension parents broadcast; the lineitem->orders edge co-
    partitions on the join key at scale. A healthy load reports zero
    orphans everywhere — the value of the query is that it turns that
    assumption into a driver-checked number per edge."""
    edges = [
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, child_t, ck, parent_t, pk in edges:
        child = load_table(spark, sf_dir, child_t).select(F.col(ck).alias("_k"))
        parent = load_table(spark, sf_dir, parent_t).select(F.col(pk).alias("_k"))
        counts = (
            child.agg(F.count(F.lit(1)).alias("n_children"))
            .crossJoin(
                F.broadcast(
                    child.join(parent, "_k", "left_anti").agg(
                        F.count(F.lit(1)).alias("n_orphans")
                    )
                )
            )
            .select(F.lit(name).alias("edge"), "n_children", "n_orphans")
        )
        out = counts if out is None else out.unionByName(counts)
    return out


@register(
    "orders_backlog_over_time",
    oracle="""
    WITH close AS (
      SELECT o.o_orderkey, o.o_orderdate,
             coalesce(max(l.l_shipdate), o.o_orderdate) AS close_date
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate),
    deltas AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS opened,
             CAST(0 AS BIGINT) AS closed
      FROM close GROUP BY 1
      UNION ALL
      SELECT close_date + INTERVAL 1 DAY, 0, CAST(count(*) AS BIGINT)
      FROM close GROUP BY 1),
    byday AS (
      SELECT d, CAST(sum(opened) AS BIGINT) AS n_opened,
             CAST(sum(closed) AS BIGINT) AS n_closed
      FROM deltas GROUP BY d),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM byday),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
              FROM bounds)
    SELECT CAST(s.d AS DATE) AS day,
           coalesce(b.n_opened, 0) AS n_opened,
           coalesce(b.n_closed, 0) AS n_closed,
           CAST(sum(coalesce(b.n_opened, 0) - coalesce(b.n_closed, 0))
                OVER (ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS backlog
    FROM spine s LEFT JOIN byday b ON b.d = s.d
    """,
    tags=("timeseries", "intervals", "operational", "extension"),
)
def orders_backlog_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OPEN-ORDER BACKLOG timeline — interval stabbing counts
    done with the signed-boundary trick: each order contributes exactly
    two boundary rows (+1 at its order date, -1 the day after its last
    lineitem shipment (the fixtures carry l_shipdate, not receiptdate)), never a row per day it stays open, so the
    fact-scale work is one aggregate regardless of how long orders
    live. The running sum then runs over the BOUNDARY-DAY table (one
    row per calendar day — thousands, not millions), which is the
    boundary-table discipline every global window in this engine
    follows: aggregate to a bounded frame first, window second. The
    close date comes from one orders⋈lineitem aggregate; orders with
    no lineitems close same-day."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    close = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.coalesce(F.max("l_shipdate"), F.first("o_orderdate")).alias(
                "close_date"
            )
        )
    )
    deltas = close.select(
        F.col("o_orderdate").alias("d"), F.lit(1).alias("opened"), F.lit(0).alias("closed")
    ).unionByName(
        close.select(
            F.date_add("close_date", 1).alias("d"),
            F.lit(0).alias("opened"),
            F.lit(1).alias("closed"),
        )
    )
    byday = deltas.groupBy("d").agg(
        F.sum("opened").cast("bigint").alias("n_opened"),
        F.sum("closed").cast("bigint").alias("n_closed"),
    )
    bounds = byday.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    from pyspark.sql import Window

    dense = spine.join(byday, "d", "left").select(
        "d",
        F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
        F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return dense.select(
        F.col("d").cast("date").alias("day"),
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(w).cast("bigint").alias(
            "backlog"
        ),
    )
