"""Core relational operator queries (SURVEY.md §2.1-2.8) mapped onto the
driver fixture tables per FIXTURES.md §B, each with a DuckDB oracle.

Reference citations are in each query's docstring; the Spark side is
pure DataFrame API so Catalyst gets full visibility (pushdown, pruning,
broadcast selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.functions.scalars import parse_market_cap
from etl_8million_data__spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.1 / §2.2 — scan, projection, predicates
# ---------------------------------------------------------------------------


@register(
    "scan_project_filter",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 1000 AND c_name IS NOT NULL
    """,
    tags=("scan", "filter", "projection"),
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + NOT NULL + range predicate; parity for the reference's
    SELECT-list + dropna pattern (main.py:313, details.py:263-270).
    The filter and the 3-column projection must both reach the parquet
    scan (PushedFilters / ReadSchema)."""
    c = _t(spark, sf_dir, "customer")
    return c.filter((F.col("c_acctbal") > 1000) & F.col("c_name").isNotNull()).select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    """,
    tags=("join", "anti"),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the reference's skip-existing incremental ingest
    (details.py:230-238,277-281: python set difference on symbols).
    Anti-joins against the *recent* order subset so both kept and
    dropped rows exist at every sf (all customers have some order)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "semi"),
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — dual of the anti-join membership test."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register(
    "segment_revenue_broadcast_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS order_cnt,
           sum({sql_cents('o.o_totalprice')}) / 100.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "broadcast", "agg"),
)
def segment_revenue_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim with an explicit broadcast hint — the §2.3
    'implicit dimension join' (financials ⋈ summary on stock). At 100 TB
    the customer dim stays broadcastable per-segment-of-keys; here it is
    outright small."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_cnt"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("revenue"),
        )
    )


@register(
    "regional_revenue_5way_join",
    oracle=f"""
    SELECT r.r_name,
           sum({sql_cents('l.l_extendedprice')} * {sql_cents('1 - l.l_discount')}) / 10000.0
             AS revenue,
           count(*) AS line_cnt
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "multi-join", "agg"),
)
def regional_revenue_5way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (TPC-H Q5 shape). lineitem⋈orders shuffles on the
    shared key; the three dims broadcast."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            (F.sum(cents("l_extendedprice") * cents(1 - F.col("l_discount"))) / 10000.0).alias(
                "revenue"
            ),
            F.count("*").alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 — aggregation / distinct / dedup
# ---------------------------------------------------------------------------


@register(
    "distinct_mktsegment",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("distinct",),
)
def distinct_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — the reference's loop driver
    (Financilas.py:135-137 SELECT DISTINCT symbol)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "group_agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum({sql_cents('l_quantity')}) / 100.0 AS sum_qty,
           sum({sql_cents('l_extendedprice')}) / 100.0 AS sum_base_price,
           sum({sql_cents('l_extendedprice')} * {sql_cents('1 - l_discount')}) / 10000.0
             AS sum_disc_price,
           sum({sql_cents('l_extendedprice')} * {sql_cents('1 - l_discount')}
               * {sql_cents('1 + l_tax')}) / 1000000.0 AS sum_charge,
           sum({sql_cents('l_quantity')}) / (100.0 * count(*)) AS avg_qty,
           sum({sql_cents('l_extendedprice')}) / (100.0 * count(*)) AS avg_price,
           sum({sql_cents('l_discount')}) / (100.0 * count(*)) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby", "flagship"),
)
def group_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-aggregate GROUP BY with a
    pushed-down date predicate. This is the flagship query for
    ``entry()`` — map-side partial aggregation means the shuffle carries
    only |groups|×|aggs| rows regardless of input scale."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    disc_price = cents("l_extendedprice") * cents(1 - F.col("l_discount"))
    charge = disc_price * cents(1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-12-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            (F.sum(disc_price) / 10000.0).alias("sum_disc_price"),
            (F.sum(charge) / 1000000.0).alias("sum_charge"),
            (F.sum(cents("l_quantity")) / (100.0 * F.count("*"))).alias("avg_qty"),
            (F.sum(cents("l_extendedprice")) / (100.0 * F.count("*"))).alias("avg_price"),
            (F.sum(cents("l_discount")) / (100.0 * F.count("*"))).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "dedup_latest_event_per_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("dedup", "window", "upsert"),
)
def dedup_latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins dedup — the Spark re-expression of the
    reference's ON DUPLICATE KEY UPDATE upsert (Financilas.py:175-182):
    row_number over the PK ordered by recency, keep rank 1."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


# ---------------------------------------------------------------------------
# §2.9 — restructuring (unpivot / JSON)
# ---------------------------------------------------------------------------


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    tags=("unpivot", "restructure"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt — the heart of the reference's stage 3
    (normalize_financials, Financilas.py:71-107: nested statements ->
    EAV fact rows). Spark's unpivot is a zero-shuffle narrow transform."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INTEGER)))::VARCHAR
             AS rebuilt
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
    tags=("json", "scalar"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access + re-serialization (reference: payload
    get()-chains Financilas.py:73-96 and json.dumps details.py:217)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int").alias("k")
    return (
        e.select("event_id", k)
        .filter(F.col("k") >= 50)
        .withColumn("rebuilt", F.to_json(F.struct("k")))
    )


# ---------------------------------------------------------------------------
# §2.5 / §2.6 — windows, sorts, top-k
# ---------------------------------------------------------------------------


@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("topk", "sort"),
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT top-k (reference verify queries,
    Financilas.py:186-195). Spark plans TakeOrderedAndProject — per-
    partition heaps, no global sort."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k via ranking window — the generalization of the
    reference's per-symbol verify top-k (SURVEY.md §2.5)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "yoy_revenue_with_lag",
    oracle=f"""
    WITH yearly AS (
      SELECT year(o_orderdate) AS order_year,
             sum({sql_cents('o_totalprice')}) / 100.0 AS revenue
      FROM orders GROUP BY year(o_orderdate))
    SELECT order_year, revenue,
           lag(revenue) OVER (ORDER BY order_year) AS prev_revenue,
           revenue - lag(revenue) OVER (ORDER BY order_year) AS yoy_delta
    FROM yearly
    """,
    tags=("window", "lag", "agg"),
)
def yoy_revenue_with_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year delta via lag() (SURVEY.md §7.2(3)). The window is
    over the tiny aggregated frame, not the fact table."""
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        (F.sum(cents("o_totalprice")) / 100.0).alias("revenue")
    )
    w = Window.orderBy("order_year")
    return yearly.select(
        "order_year",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("yoy_delta"),
    )


@register(
    "cumulative_revenue_per_customer",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           sum({sql_cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS cum_revenue
    FROM orders
    """,
    tags=("window", "running"),
)
def cumulative_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key — exact integer-cents window sum so the
    running values are bit-identical to the oracle."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w) / 100.0).alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations
# ---------------------------------------------------------------------------


@register(
    "set_ops_nation_coverage",
    oracle="""
    SELECT 'customer_only' AS side, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both', nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'supplier_only', nationkey FROM (
      SELECT s_nationkey AS nationkey FROM supplier
      EXCEPT SELECT c_nationkey FROM customer)
    """,
    tags=("setops",),
)
def set_ops_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL — §2.7 (the reference only has the
    anti-join set-difference; the rest come free in Spark)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tag = lambda df, v: df.withColumn("side", F.lit(v)).select("side", "nationkey")  # noqa: E731
    return (
        tag(c.subtract(s), "customer_only")
        .unionByName(tag(c.intersect(s), "both"))
        .unionByName(tag(s.subtract(c), "supplier_only"))
    )


# ---------------------------------------------------------------------------
# §2.8 — scalar functions
# ---------------------------------------------------------------------------


@register(
    "scalar_string_functions",
    oracle=r"""
    SELECT doc_id,
           upper(substr(trim(text), 1, 10)) AS head10,
           length(text) AS text_len,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           regexp_replace(substr(text, 1, 50), '\s+', ' ', 'g') AS collapsed50,
           len(regexp_extract_all(text, '[a-z0-9]+')) AS n_words
    FROM documents
    """,
    tags=("scalar", "string"),
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim/upper/substring/regexp_extract/whitespace-collapse/token count
    (reference: details.py:266, Summary.py:110-115, main.py:109)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring(F.trim(F.col("text")), 1, 10)).alias("head10"),
        F.length("text").alias("text_len"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.substring(F.col("text"), 1, 50), r"\s+", " ").alias("collapsed50"),
        F.size(F.regexp_extract_all("text", F.lit(r"([a-z0-9]+)"), 1)).alias("n_words"),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           dayofweek(o_orderdate) + 1 AS dow,
           o_orderdate + INTERVAL 30 DAY AS ship_by
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    tags=("scalar", "date"),
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/quarter/month/day/trunc/dow/interval arithmetic
    (reference: Financilas.py:68-69,93; details.py:39-44).
    DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday — oracle adds 1."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.dayofweek("o_orderdate").alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ship_by"),
    )


@register(
    "coalesce_nullif_scalars",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'none') AS etype_clean,
           greatest(value, 100.0) AS val_floor100,
           least(value, 100.0) AS val_cap100,
           CASE WHEN isnan(value) THEN NULL ELSE value END AS val_no_nan
    FROM events
    """,
    tags=("scalar", "null"),
)
def coalesce_nullif_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce chains / nullif / NaN->NULL (reference: Financilas.py:74-76,
    Summary.py:156-173, details.py:88-101)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("none")).alias("etype_clean"),
        F.greatest("value", F.lit(100.0)).alias("val_floor100"),
        F.least("value", F.lit(100.0)).alias("val_cap100"),
        F.when(F.isnan("value"), F.lit(None)).otherwise(F.col("value")).alias("val_no_nan"),
    )


@register(
    "parse_market_cap_suffixes",
    oracle="""
    WITH t(symbol, market_cap) AS (VALUES
      ('AAPL', '3.01T'), ('MSFT', '32.42B'), ('ACME', '297.82M'),
      ('TINY', '963.4K'), ('MISS', '-'), ('NUL', NULL),
      ('PLAIN', '123'), ('PAD', ' 45.5B '))
    SELECT symbol,
           CASE upper(trim(market_cap))[-1]
             WHEN 'T' THEN 1e12 WHEN 'B' THEN 1e9 WHEN 'M' THEN 1e6 WHEN 'K' THEN 1e3
             ELSE 1.0 END
           * TRY_CAST(regexp_extract(upper(trim(market_cap)), '^([0-9]*\\.?[0-9]+)', 1)
                      AS DOUBLE) AS market_cap_usd
    FROM t
    """,
    tags=("scalar", "extension"),
)
def parse_market_cap_suffixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B/M/K/T-suffix market-cap parser (extension per SURVEY.md §7.2(3):
    the reference keeps market_cap as a raw string, stocks_full.csv:2)."""
    rows = [
        ("AAPL", "3.01T"),
        ("MSFT", "32.42B"),
        ("ACME", "297.82M"),
        ("TINY", "963.4K"),
        ("MISS", "-"),
        ("NUL", None),
        ("PLAIN", "123"),
        ("PAD", " 45.5B "),
    ]
    df = spark.createDataFrame(rows, "symbol string, market_cap string")
    return df.select("symbol", parse_market_cap(F.col("market_cap")).alias("market_cap_usd"))


@register(
    "case_when_order_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'large' END AS bucket,
           count(*) AS cnt,
           sum({sql_cents('o_totalprice')}) / 100.0 AS revenue
    FROM orders
    GROUP BY 1
    """,
    tags=("scalar", "agg"),
)
def case_when_order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation (the reference's period encoding
    when/otherwise pattern, Financilas.py:94)."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("large")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count("*").alias("cnt"),
        (F.sum(cents("o_totalprice")) / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# pivot / rollup (§7.2(3) analytical queries over the EAV model)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_type_avg",
    oracle="""
    SELECT user_id,
           sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'click')
             / (100.0 * count(*) FILTER (event_type = 'click')) AS click,
           sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'error')
             / (100.0 * count(*) FILTER (event_type = 'error')) AS error,
           sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'purchase')
             / (100.0 * count(*) FILTER (event_type = 'purchase')) AS purchase,
           sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'signup')
             / (100.0 * count(*) FILTER (event_type = 'signup')) AS signup,
           sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'view')
             / (100.0 * count(*) FILTER (event_type = 'view')) AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("pivot", "agg"),
)
def pivot_event_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot — the inverse of the EAV unpivot; SURVEY.md §7.2(3)
    'pivot metrics->columns'. Explicit pivot values avoid the extra
    distinct-scan job and keep the plan static at scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(cents("value")) / (100.0 * F.count(F.lit(1))))
    )


@register(
    "rollup_year_priority",
    oracle=f"""
    SELECT year(o_orderdate) AS order_year, o_orderpriority,
           count(*) AS cnt,
           sum({sql_cents('o_totalprice')}) / 100.0 AS revenue
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
    tags=("rollup", "agg"),
)
def rollup_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (free in Spark per SURVEY.md §2.4)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup(F.year("o_orderdate").alias("order_year"), F.col("o_orderpriority")).agg(
        F.count("*").alias("cnt"),
        (F.sum(cents("o_totalprice")) / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped composites
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT sum({sql_cents('l_extendedprice')} * {sql_cents('l_discount')}) / 10000.0
             AS promo_revenue,
           count(*) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "pushdown"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly-selective conjunctive filter + global aggregate (TPC-H Q6
    shape) — the canonical predicate-pushdown check: all four predicates
    must appear in PushedFilters."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    return l.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (F.sum(cents("l_extendedprice") * cents("l_discount")) / 10000.0).alias("promo_revenue"),
        F.count("*").alias("qualifying_lines"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           sum({sql_cents('l.l_extendedprice')} * {sql_cents('1 - l.l_discount')}) / 10000.0
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + 3-way join + aggregate + top-k (TPC-H Q3 shape). Exact
    cents revenue keeps the top-10 cut deterministic vs the oracle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15")))
            & (F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15")))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(cents("l_extendedprice") * cents(1 - F.col("l_discount"))) / 10000.0).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "json_variant_semistructured",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "variant", "semistructured"),
)
def json_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema JSON via the VARIANT type (Spark 4): parse_json once
    into a binary variant, then typed try_variant_get extraction — the
    modern engine path for semi-structured payloads (vs per-access
    get_json_object string re-parsing; at 100 TB the parse-once
    encoding wins on every repeated access)."""
    e = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return e.select("event_type", k.alias("_k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_k").alias("sum_k"),
        F.max("_k").alias("max_k"),
    )
