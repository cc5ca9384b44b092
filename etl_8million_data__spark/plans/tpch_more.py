"""Adapted TPC-H query shapes over the fixture star schema (columns the
fixtures lack — shipmode, commitdate — are substituted with available
ones; the *operator shapes* are what's exercised): EXISTS-against-fact,
conditional ratio aggregate, HAVING over grouped sums, disjunctive
multi-attribute predicates, correlated-average + anti-join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "tpch_q4_late_shipment_orders",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_cnt
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "exists", "semi-join"),
)
def tpch_q4_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS against the fact (late shipments ≡ shipdate
    more than 60 days after order date; fixture has no commitdate)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    o_f = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    late = o_f.join(
        l,
        (l.l_orderkey == o_f.o_orderkey)
        & (l.l_shipdate > o_f.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_cnt"))


@register(
    "tpch_q14_promo_revenue_ratio",
    oracle=f"""
    SELECT 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                   THEN {sql_cents('l.l_extendedprice')} * {sql_cents('1 - l.l_discount')}
                   ELSE 0 END)
             / sum({sql_cents('l.l_extendedprice')} * {sql_cents('1 - l.l_discount')})
             AS promo_pct,
           count(*) AS line_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("tpch", "conditional-agg", "ratio"),
)
def tpch_q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-aggregate ratio over a month of shipments
    (exact integer numerator/denominator, single final division)."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    p = _t(spark, sf_dir, "part")
    disc = cents("l_extendedprice") * cents(1 - F.col("l_discount"))
    j = (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0)))
    return j.agg(
        (100.0 * promo / F.sum(disc)).alias("promo_pct"),
        F.count(F.lit(1)).alias("line_cnt"),
    )


@register(
    "tpch_q18_large_volume_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           sum({sql_cents('l.l_quantity')}) / 100.0 AS total_qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    HAVING sum({sql_cents('l.l_quantity')}) / 100.0 > 150
    """,
    tags=("tpch", "having", "agg"),
)
def tpch_q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: grouped sum with HAVING over the aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg((F.sum(cents("l_quantity")) / 100.0).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


@register(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT sum({sql_cents('l.l_extendedprice')} * {sql_cents('1 - l.l_discount')}) / 10000.0
             AS revenue,
           count(*) AS line_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("tpch", "disjunction", "join"),
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides — exercises
    predicate normalization and partial pushdown of disjuncts."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(20, 50) & q.between(20, 40))
    )
    return j.filter(cond).agg(
        (F.sum(cents("l_extendedprice") * cents(1 - F.col("l_discount"))) / 10000.0).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("line_cnt"),
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    WITH avg_bal AS (
      SELECT sum({sql_cents('c_acctbal')}) / (100.0 * count(*)) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey, count(*) AS numcust,
           sum({sql_cents('c.c_acctbal')}) / 100.0 AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
    tags=("tpch", "scalar-subquery", "anti-join"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery (avg of positive balances, exact
    cents) + anti-join against *recent* orders (every fixture customer
    has some order, so 'no orders at all' would be vacuous), grouped
    by nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents("c_acctbal")) / (100.0 * F.count(F.lit(1)))).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("totacctbal"),
        )
    )


@register(
    "tpch_q20_dominant_part_suppliers",
    oracle=f"""
    WITH ps AS (
      SELECT l.l_partkey, l.l_suppkey, sum({sql_cents('l.l_quantity')}) AS sq
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
        AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l.l_partkey, l.l_suppkey),
    tot AS (SELECT l_partkey, sum(sq) AS tq FROM ps GROUP BY l_partkey)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.l_suppkey FROM ps JOIN tot USING (l_partkey)
      WHERE ps.sq * 2 > tot.tq)
    """,
    tags=("tpch", "nested-in", "semi-join", "two-level-agg"),
)
def tpch_q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (`Financilas.py` has nothing like it; pure extension):
    nested IN subqueries — part-name filter feeds a per-(part,supplier)
    aggregate, compared against a per-part total, and the surviving
    supplier keys semi-join the supplier dim. The fixture set has no
    partsupp/availqty, so 1996 shipped quantity stands in for stock:
    a supplier qualifies when it shipped >50% of a red-part's 1996
    volume. Exact integer-cents quantity sums keep both engines
    bit-identical. Scale notes: the part filter broadcasts; the second
    aggregate re-uses the first's output (tiny, one extra exchange on
    l_partkey); supplier-side is a broadcast semi join."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select("p_partkey")
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    l96 = l.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    ).join(F.broadcast(part), l.l_partkey == part.p_partkey, "left_semi")
    per_ps = l96.groupBy("l_partkey", "l_suppkey").agg(F.sum(cents("l_quantity")).alias("sq"))
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("sq") * 2 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")
