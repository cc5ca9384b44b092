"""Remaining adapted TPC-H query shapes (beyond tpch_more.py) over the
fixture star schema. Columns the fixtures lack (partsupp, commitdate,
shipmode, comment) are substituted with available ones — what is
exercised is each query's *operator shape*: correlated min (Q2), nation
x nation self-join (Q7), market-share ratio (Q8), multi-dim profit
rollup (Q9), returned-item top-k (Q10), HAVING vs global scalar (Q11),
conditional counts (Q12), outer-join histogram-of-counts (Q13), scalar
max over a derived view (Q15), NOT-IN + count-distinct (Q16),
correlated-average threshold (Q17), EXISTS/NOT-EXISTS double
correlation (Q21).

All money aggregates use exact integer cents (functions.exact) so value
hashes are bit-identical to the DuckDB oracle; all top-k queries carry a
total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.plans.registry import register

_REV = f"{sql_cents('l.l_extendedprice')} * {sql_cents('1 - l.l_discount')}"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev_col() -> F.Column:
    return cents("l_extendedprice") * cents(1 - F.col("l_discount"))


@register(
    "tpch_q2_min_price_part_per_type_size",
    oracle="""
    SELECT p.p_type, p.p_size, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
      SELECT min(p2.p_retailprice) FROM part p2
      WHERE p2.p_type = p.p_type AND p2.p_size = p.p_size)
    """,
    tags=("tpch", "correlated-subquery", "window"),
)
def tpch_q2_min_price_part_per_type_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated min subquery (cheapest part per group),
    decorrelated in Spark as a window min — one scan, no self-join."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type", "p_size")
    return (
        p.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_size", "p_partkey", "p_retailprice")
    )


@register(
    "tpch_q7_nation_pair_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           sum({_REV}) / 10000.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name <> cn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    tags=("tpch", "self-join-dim", "multi-join"),
)
def tpch_q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between distinct (supplier nation,
    customer nation) pairs per year — the nation dim joined twice under
    different roles; small dims broadcast, fact-fact join shuffles."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    lf = l.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    return (
        lf.join(F.broadcast(s), lf.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg((F.sum(_rev_col()) / 10000.0).alias("revenue"))
    )


@register(
    "tpch_q8_nation_market_share",
    oracle=f"""
    SELECT year(o.o_orderdate) AS o_year,
           sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV} ELSE 0 END) * 1.0
             / sum({_REV}) AS mkt_share
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o_year
    """,
    tags=("tpch", "ratio", "conditional-agg"),
)
def tpch_q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of total revenue per order year —
    conditional numerator over the same exact-integer volume measure,
    single final double division."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    vol = _rev_col()
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0)))
                * 1.0
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_profit_by_nation_year",
    oracle=f"""
    SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
           sum({_REV}) / 10000.0 AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY nation, o_year
    """,
    tags=("tpch", "multi-join", "like-filter"),
)
def tpch_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit rolled up by supplier nation and
    order year, with a LIKE filter on part name (fixture lacks
    partsupp.supplycost, so profit ≡ discounted revenue)."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n.select(F.col("n_nationkey"), F.col("n_name").alias("nation"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(_rev_col()) / 10000.0).alias("profit"))
    )


@register(
    "tpch_q10_returned_item_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum({_REV}) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    tags=("tpch", "topk", "multi-join"),
)
def tpch_q10_returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned the most revenue in a half-year
    window — join-heavy agg with a deterministic top-20 (exact-cents
    revenue, custkey tie-break)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")  # noqa: E741
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev_col()) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q11_nation_balance_concentration",
    oracle=f"""
    WITH tot AS (SELECT sum({sql_cents('s_acctbal')}) AS t FROM supplier)
    SELECT s.s_nationkey, sum({sql_cents('s.s_acctbal')}) / 100.0 AS nation_bal
    FROM supplier s
    GROUP BY s.s_nationkey
    HAVING sum({sql_cents('s.s_acctbal')}) * 1.0 > (SELECT t / 50.0 FROM tot)
    """,
    tags=("tpch", "having", "scalar-subquery"),
)
def tpch_q11_nation_balance_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups whose share of a global total exceeds a
    threshold — HAVING against a scalar subquery (fixture lacks
    partsupp, so supplier account balances stand in for stock value)."""
    s = _t(spark, sf_dir, "supplier")
    tot = s.agg(F.sum(cents("s_acctbal")).alias("t"))
    return (
        s.groupBy("s_nationkey")
        .agg(F.sum(cents("s_acctbal")).alias("_bal_cents"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("_bal_cents") * 1.0 > F.col("t") / 50.0)
        .select(
            "s_nationkey", (F.col("_bal_cents") / 100.0).alias("nation_bal")
        )
    )


@register(
    "tpch_q12_late_lines_priority_counts",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    tags=("tpch", "conditional-agg", "join"),
)
def tpch_q12_late_lines_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: high/low-priority conditional counts over late-shipped
    lines (returnflag stands in for the fixture's missing shipmode)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "double-agg"),
)
def tpch_q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: histogram of per-customer order counts — left outer
    join with an extra join-side predicate, then aggregate-of-aggregate
    (customers with zero qualifying orders must survive as c_count=0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier_by_quarter_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey, sum({_REV}) / 10000.0 AS total_rev
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l.l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("tpch", "scalar-subquery", "view"),
)
def tpch_q15_top_supplier_by_quarter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: derived revenue view reused twice — once for the rows,
    once for the scalar max (exact-cents revenue makes the double
    equality safe across engines)."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .groupBy("l_suppkey")
        .agg((F.sum(_rev_col()) / 10000.0).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "tpch_q16_supplier_count_by_part_attrs",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "not-in", "count-distinct"),
)
def tpch_q16_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute triple,
    excluding a NOT-IN supplier set (anti-join in Spark; lineitem stands
    in for the fixture's missing partsupp)."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000.0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pq AS (
      SELECT l_partkey, sum({sql_cents('l_quantity')}) AS sq, count(*) AS c
      FROM lineitem GROUP BY l_partkey)
    SELECT sum({sql_cents('l.l_extendedprice')}) / 700.0 AS avg_yearly,
           count(*) AS line_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#19'
      AND {sql_cents('l.l_quantity')} * pq.c * 5 < pq.sq
    """,
    tags=("tpch", "correlated-avg", "threshold"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: lines below 20% of their part's average quantity.
    The correlated average decorrelates to a per-part aggregate join;
    ``qty < 0.2 * avg`` is rewritten ``qty_cents * count * 5 < sum_cents``
    so the comparison is pure integer arithmetic in both engines."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#19")
    pq = l.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(cents("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("c")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .filter(cents("l_quantity") * F.col("c") * 5 < F.col("sq"))
        .agg(
            (F.sum(cents("l_extendedprice")) / 700.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 10
    """,
    tags=("tpch", "exists", "not-exists", "topk"),
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers whose late lines were the *only* late lines
    in multi-supplier orders. The EXISTS / NOT-EXISTS pair decorrelates
    to one per-order aggregate: distinct suppliers >= 2 AND distinct
    late suppliers == 1 — a single extra scan instead of two
    correlated ones."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")  # noqa: E741
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # Single pass over the fact join (the naive form scans it twice) and
    # no COUNT(DISTINCT) Expand: per-(order, supplier) late-line counts
    # feed BOTH the order qualification (>=2 suppliers, exactly one of
    # them late) and the final per-supplier waiting-line count. The one
    # explicit repartition by orderkey satisfies both groupBys (orderkey
    # is a prefix of each key) and the qual join's clustering.
    per_supp = (
        j.repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("_cnt_late"))
    )
    qual = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.when(F.col("_cnt_late") > 0, 1).otherwise(0)).alias("n_late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select(F.col("l_orderkey").alias("q_orderkey"))
    )
    return (
        per_supp.filter(F.col("_cnt_late") > 0)
        .join(qual, F.col("l_orderkey") == F.col("q_orderkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("_cnt_late").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           sum({_REV}) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("tpch", "multi-join", "local-supplier"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper — local supplier volume: revenue from lineitems
    whose supplier and customer share a NATION, rolled up per nation of
    one region and one order year. Completes the full 22-query TPC-H
    shape coverage (Q1 = group_agg_pricing_summary's pricing summary;
    regional_revenue_5way_join is the Q5-star SHAPE without the
    same-nation constraint — this is the real thing, supplier join
    included). Plan shape: orderdate range pushed into the orders scan;
    supplier/nation/region broadcast; the same-nation equality rides
    the supplier join condition (c_nationkey = s_nationkey), so it
    prunes inside the join instead of post-filtering the fan-out;
    lineitem ⋈ orders is the one shuffle."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    of = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    rf = r.filter(F.col("r_name") == "ASIA")
    return (
        l.join(of, l.l_orderkey == of.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(rf), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(_rev_col()) / 10000.0).alias("revenue"))
    )
