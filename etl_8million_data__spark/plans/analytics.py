"""Analytical query coverage beyond the reference's surface
(SURVEY.md §2.4/§2.5 note these are 'free in Spark' — here they are
exercised and oracle-checked): correlated subqueries, grouping sets,
exact percentiles, EAV pivot round-trip, moving windows, ordered
aggregation, math scalars."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "correlated_above_nation_avg",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("subquery", "correlated"),
)
def correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join — SURVEY.md §4 'subquery decorrelation free').

    avg() on raw doubles would be engine-order-dependent; comparing
    with a strict > against the *same-engine* average is stable because
    both engines compute the average from exact cents here."""
    c = _t(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(
        (F.sum(cents("c_acctbal")) / (100.0 * F.count(F.lit(1)))).alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@register(
    "grouping_sets_region_year",
    oracle=f"""
    SELECT n_name, CAST(order_year AS INTEGER) AS order_year, cnt,
           CAST(revenue AS DOUBLE) AS revenue
    FROM (
      SELECT n.n_name, year(o.o_orderdate) AS order_year,
             count(*) AS cnt,
             sum({sql_cents('o.o_totalprice')}) / 100.0 AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY GROUPING SETS ((n.n_name, year(o.o_orderdate)), (n.n_name), ())
    )
    """,
    tags=("grouping-sets", "agg", "sql-api"),
)
def grouping_sets_region_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (spark.sql over registered
    views) — exercises the engine's SQL entry point alongside the
    DataFrame API."""
    for name in ("orders", "customer", "nation"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        f"""
        SELECT n.n_name, year(o.o_orderdate) AS order_year,
               count(*) AS cnt,
               CAST(sum({sql_cents('o.o_totalprice')}) / 100.0 AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name, year(o.o_orderdate)), (n.n_name), ())
        """
    )


@register(
    "exact_percentiles_order_value",
    oracle=f"""
    SELECT o_orderpriority,
           quantile_cont({sql_cents('o_totalprice')}, 0.5) / 100.0 AS median_price,
           quantile_cont({sql_cents('o_totalprice')}, 0.9) / 100.0 AS p90_price,
           count(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("percentile", "agg"),
)
def exact_percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over integer cents (both engines
    use the same (n-1)*p linear interpolation on identical ints)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        (F.percentile(cents("o_totalprice"), F.lit(0.5)) / 100.0).alias("median_price"),
        (F.percentile(cents("o_totalprice"), F.lit(0.9)) / 100.0).alias("p90_price"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "count_distinct_per_nation",
    oracle="""
    SELECT n.n_name,
           count(DISTINCT c.c_custkey) AS n_customers,
           count(DISTINCT s.s_suppkey) AS n_suppliers
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("distinct", "agg", "outer-join"),
)
def count_distinct_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct aggregates over left joins (Spark expands
    to a grouping-sets style plan internally)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("s_suppkey").alias("n_suppliers"),
        )
    )


@register(
    "eav_pivot_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           max(l_quantity) AS quantity, max(l_extendedprice) AS extendedprice,
           max(l_discount) AS discount, max(l_tax) AS tax
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    """,
    tags=("pivot", "unpivot", "roundtrip"),
)
def eav_pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot -> pivot round trip: proves the EAV long form (the
    reference's central model, SURVEY.md §1.1) reconstructs the wide
    table. (orderkey, linenumber) is not unique in the fixture, so the
    round trip lands at key grain with max-per-measure — the oracle
    states exactly that."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    long = l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("l_orderkey", "l_linenumber")
        .pivot("measure", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
        .agg(F.max("value"))
        .withColumnsRenamed(
            {
                "l_quantity": "quantity",
                "l_extendedprice": "extendedprice",
                "l_discount": "discount",
                "l_tax": "tax",
            }
        )
    )


@register(
    "moving_avg_and_ntile",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           sum({sql_cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           / (100.0 * count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS moving_avg_3,
           ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
    FROM orders
    """,
    tags=("window", "moving-avg", "ntile"),
)
def moving_avg_and_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row frame (exact cents) + global ntile
    quartiles with a total-order tie-break.

    The quartile is NOT a global-orderBy window (which Spark executes
    on a single partition — the classic scale killer): rows are range-
    bucketed by price, a tiny aggregated boundary table supplies each
    bucket's cumulative offset (and the total n), and the global rank
    is offset + a per-bucket row_number — every window here partitions
    on the bucket key. The ntile id is then pure integer arithmetic on
    (rank, n): the first n%4 tiles hold n//4+1 rows. Bit-identical to
    ntile(4) OVER (ORDER BY price DESC, orderkey) because the bucket
    key floor(price/25000) is monotone in the sort key. At 100 TB the
    fixed-width buckets would come from a sampled quantile sketch
    instead, but the plan shape (boundary broadcast + co-partitioned
    rank) is the scalable one."""
    from etl_8million_data__spark.operators.partitioning import global_ntile

    o = _t(spark, sf_dir, "orders")
    frame = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    staged = o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents("o_totalprice")).over(frame)
            / (100.0 * F.count(F.lit(1)).over(frame))
        ).alias("moving_avg_3"),
        "o_totalprice",
    )
    # bucket key floor(price/25000) DESC is monotone in the sort key
    # (price DESC), which is all global_ntile requires
    return global_ntile(
        staged,
        4,
        "o_totalprice",
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 25000).cast("bigint"),
        descending=True,
        out_col="price_quartile",
    ).select("o_custkey", "o_orderkey", "moving_avg_3", "price_quartile")


@register(
    "ordered_string_agg_orders",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg", "string-agg"),
)
def ordered_string_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered concatenation per key (sort_array over
    collect_list — collection order is nondeterministic, the sort
    restores a total order)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("o_orderkey")), lambda x: x.cast("string")),
            ",",
        ).alias("order_keys")
    )


@register(
    "math_scalars_portable",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_diff,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           round(l_extendedprice / 1000.0, 2) AS price_k,
           sqrt(l_quantity) AS sqrt_qty,
           CAST(sign(l_discount - 0.05) AS INT) AS sign_diff,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    tags=("scalar", "math"),
)
def math_scalars_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable math scalars (IEEE-exact: abs/ceil/floor/round/sqrt/
    sign/mod — deliberately no transcendentals, whose libm last-ulp
    behavior differs across engines)."""
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    return l.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.round(F.col("l_extendedprice") / 1000.0, 2).alias("price_k"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sign_diff"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "union_by_name_missing_cols",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS acctbal,
           'customer' AS kind
    FROM customer
    UNION ALL BY NAME
    SELECT s_suppkey AS entity_key, s_name AS entity_name, NULL AS acctbal,
           'supplier' AS kind
    FROM supplier
    """,
    tags=("setops", "union-by-name"),
)
def union_by_name_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — schema-evolution-style
    append where the narrower side null-fills."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "cube_returnflag_status_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum({sql_cents('l_extendedprice')}) / 100.0 AS sum_price,
           count(*) AS line_cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_returnflag_status_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping levels in
    one pass — completes the rollup/grouping-sets/cube trio."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_price"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "window_rank_zoo_per_customer",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           dense_rank() OVER w AS dr,
           percent_rank() OVER w AS pr,
           {sql_cents('o_totalprice')}
             - lag({sql_cents('o_totalprice')}, 1, CAST(0 AS BIGINT)) OVER w
             AS delta_prev_cents,
           first_value({sql_cents('o_totalprice')}) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_price_cents,
           last_value({sql_cents('o_totalprice')}) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "rank", "frames"),
)
def window_rank_zoo_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window surface in one query:
    dense_rank, percent_rank (exact (rank-1)/(n-1) integer ratio),
    lag-with-default delta, and first/last_value under explicit ROWS
    frames — per-customer windows keep state bounded at scale."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = cents("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("dr"),
        F.percent_rank().over(w).alias("pr"),
        (price - F.lag(price, 1, 0).over(w)).alias("delta_prev_cents"),
        F.first(price).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_price_cents"),
        F.last(price).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("last_price_cents"),
    )


@register(
    "histogram_order_totalprice",
    oracle=f"""
    SELECT least(CAST(floor(o_totalprice / 25000) AS INTEGER), 19) AS bucket,
           count(*) AS n_orders,
           sum({sql_cents('o_totalprice')}) / 100.0 AS total_value
    FROM orders GROUP BY 1
    """,
    tags=("aggregation", "histogram"),
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width_bucket shape): 25k-wide
    buckets with the last bucket open-ended. One map-side-combined
    hash aggregate on a derived integer key — the profile/skew-probe
    primitive for choosing partition bounds at scale. Exact cents
    sums keep the per-bucket totals hash-identical to the oracle."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000).cast("int"), F.lit(19)
    ).alias("bucket")
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents("o_totalprice")) / 100.0).alias("total_value"),
    )


@register(
    "quantile_binning_order_value",
    oracle=f"""
    WITH b AS (
      SELECT o_orderpriority,
             ntile(4) OVER (
               PARTITION BY o_orderpriority
               ORDER BY {sql_cents('o_totalprice')}, o_orderkey) AS bin,
             {sql_cents('o_totalprice')} AS price_cents
      FROM orders)
    SELECT o_orderpriority, bin, count(*) AS n_orders,
           min(price_cents) AS lo_cents, max(price_cents) AS hi_cents
    FROM b GROUP BY o_orderpriority, bin
    """,
    tags=("binning", "window", "feature-eng", "extension"),
)
def quantile_binning_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization (feature-engineering quartiles):
    ntile(4) per order priority yields per-stratum bin edges. The
    window partitions on the stratum key, so the sort is distributed
    per group — never a single global sort — and scales with the
    widest stratum. Ordering on (price_cents, o_orderkey) totalizes
    ties, making bin membership — and thus the min/max edges —
    identical in both engines."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        cents("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            F.ntile(4).over(w).alias("bin"),
            cents("o_totalprice").alias("price_cents"),
        )
        .groupBy("o_orderpriority", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("price_cents").alias("lo_cents"),
            F.max("price_cents").alias("hi_cents"),
        )
    )


@register(
    "range_bounds_sampled_orders",
    oracle=f"""
    WITH s AS (
      SELECT {sql_cents('o_totalprice')} AS vc, o_orderkey
      FROM orders
      WHERE (((o_orderkey % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000 < 100),
    r AS (
      SELECT vc, o_orderkey,
             row_number() OVER (ORDER BY vc, o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM s)
    SELECT CAST(b.b AS INT) AS bound_no,
           max(CASE WHEN rn = (n * b.b) // 8 THEN vc END) / 100.0 AS bound_value
    FROM r, (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS b) b
    WHERE rn = (n * b.b) // 8
    GROUP BY b.b
    """,
    tags=("partitioning", "sampling", "quantile", "extension", "scale-path"),
)
def range_bounds_sampled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary chooser (operators/partitioning): the
    7 octile split points of order value from a deterministic 10%
    key-hash sample — what Spark's RangePartitioner computes from a
    random sample, made reproducible (multiplicative key hash, explicit
    integer ranks) so the partition layout derived from it is stable
    across runs/retries/engines and exactly oracle-checkable. The only
    full-order window runs over the bounded sample; the 7-row result
    broadcasts into repartitionByRange / bucket-id joins downstream."""
    from etl_8million_data__spark.operators.partitioning import sampled_range_bounds

    o = _t(spark, sf_dir, "orders")
    bounds = sampled_range_bounds(
        o, cents("o_totalprice"), "o_orderkey", n_buckets=8, sample_permille=100
    )
    return bounds.select("bound_no", (F.col("bound_value") / 100.0).alias("bound_value"))


@register(
    "winsorized_value_stats_per_type",
    oracle=f"""
    WITH r AS (
      SELECT event_type, {sql_cents('value')} AS vc, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {sql_cents('value')} NULLS LAST, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    th AS (
      SELECT event_type,
             max(CASE WHEN rn = (n - 1) // 10 + 1 THEN vc END) AS lo,
             max(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN vc END) AS hi
      FROM r GROUP BY event_type)
    SELECT r.event_type,
           count(*) AS n,
           min(th.lo) / 100.0 AS p10,
           min(th.hi) / 100.0 AS p90,
           CAST(sum(least(greatest(r.vc, th.lo), th.hi)) AS BIGINT) / (100.0 * count(*))
             AS winsorized_mean,
           CAST(sum(CASE WHEN r.vc < th.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(sum(CASE WHEN r.vc > th.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
    FROM r JOIN th ON th.event_type = r.event_type
    GROUP BY r.event_type
    """,
    tags=("robust-stats", "percentile", "winsorize", "extension"),
)
def winsorized_value_stats_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust (winsorized) statistics: clip each event value to
    its type's discrete [p10, p90] before averaging.  Thresholds come
    from explicit integer rank arithmetic ((n-1)//10 + 1 over the
    (cents, event_id) total order) — no engine quantile semantics are
    load-bearing — and clipping/summation stays in integer cents, so
    the mean is bit-exact.  One shuffle by type serves the rank window,
    the threshold aggregate, and the final aggregate; thresholds
    broadcast back."""
    e = _t(spark, sf_dir, "events")
    r = e.select(
        "event_type",
        cents("value").alias("vc"),
        "event_id",
    )
    # asc_nulls_last + NULLS LAST in the oracle: Spark's default ASC is
    # nulls-first, DuckDB's is nulls-last — the rank thresholds would
    # diverge if value ever contained NULLs.
    w = Window.partitionBy("event_type").orderBy(
        F.col("vc").asc_nulls_last(), "event_id"
    )
    r = r.select(
        "event_type",
        "vc",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    # F.floor, not "/": Spark column division is float division, so a
    # bare (n-1)/10 + 1 is a non-integer the row_number never equals
    lo_rank = F.floor((F.col("n") - 1) / 10) + 1
    hi_rank = F.floor(((F.col("n") - 1) * 9) / 10) + 1
    th = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("vc"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("vc"))).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("vc"), F.col("lo")), F.col("hi"))
    return (
        r.join(F.broadcast(th), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("lo") / 100.0).alias("p10"),
            (F.min("hi") / 100.0).alias("p90"),
            (F.sum(clipped).cast("bigint") / (100.0 * F.count(F.lit(1)))).alias(
                "winsorized_mean"
            ),
            F.sum(F.when(F.col("vc") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("vc") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
    )


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS n_orders,
             CAST(sum({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
      FROM orders GROUP BY 1),
    scored AS (
      SELECT custkey, last_order, n_orders, total_cents,
             ntile(5) OVER (ORDER BY last_order DESC, custkey) AS r_score,
             ntile(5) OVER (ORDER BY n_orders DESC, custkey) AS f_score,
             ntile(5) OVER (ORDER BY total_cents DESC, custkey) AS m_score
      FROM base)
    SELECT custkey, last_order, n_orders, total_cents,
           r_score, f_score, m_score,
           r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
    FROM scored
    """,
    tags=("analytics", "segmentation", "extension"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the standard customer-value grid: per
    customer recency (last order date), frequency (order count), and
    monetary (exact integer cents), each scored into quintiles under a
    (metric DESC, custkey) TOTAL order so bucket boundaries are
    deterministic in both engines (ntile's equal-buckets-remainder-to-
    first rule is shared), concatenated into the familiar '111'..'555'
    segment label.  Scale shape: each quintile is a
    :func:`operators.partitioning.global_ntile` — range-bucketed
    boundary-table offsets, NO single-partition window — because the
    customer dimension scales with the data (TPC-H sf100 = 15 M
    customers; three global ntile windows would funnel them through
    one task thrice).  Each bucket key is monotone in its sort key:
    months-since-epoch for recency, the (small-domain) order count
    itself for frequency, floor(cents/10M) for monetary."""
    from etl_8million_data__spark.operators.partitioning import global_ntile

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )
    scored = global_ntile(
        base, 5, "last_order", "custkey",
        (F.year("last_order") * 12 + F.month("last_order")).cast("bigint"),
        descending=True, out_col="r_score",
    )
    scored = global_ntile(
        scored, 5, "n_orders", "custkey",
        F.col("n_orders").cast("bigint"),
        descending=True, out_col="f_score",
    )
    scored = global_ntile(
        scored, 5, "total_cents", "custkey",
        F.floor(F.col("total_cents") / 10_000_000).cast("bigint"),
        descending=True, out_col="m_score",
    )
    scored = scored.select(
        "custkey", "last_order", "n_orders", "total_cents",
        "r_score", "f_score", "m_score",
    )
    return scored.select(
        "*",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


@register(
    "orders_market_basket",
    oracle="""
    WITH basket0 AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    bsz AS (SELECT ok FROM basket0 GROUP BY ok HAVING count(*) <= 64),
    basket AS (SELECT b.ok, b.pk FROM basket0 b JOIN bsz USING (ok)),
    np AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_p FROM basket GROUP BY pk),
    tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM basket),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2),
    scored AS (
      SELECT part_a, part_b, n_ab, na.n_p AS n_a, nb.n_p AS n_b,
             n_ab * 1.0 / na.n_p AS confidence_a_to_b,
             n_ab * t.n_orders * 1.0 / (na.n_p * nb.n_p) AS lift
      FROM pairs
      JOIN np na ON na.pk = part_a
      JOIN np nb ON nb.pk = part_b
      CROSS JOIN tot t
      WHERE n_ab >= 2)
    SELECT * FROM scored
    ORDER BY lift DESC, part_a, part_b LIMIT 50
    """,
    tags=("analytics", "association-rules", "extension"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: top-50 part
    pairs by LIFT n_ab·N/(n_a·n_b) with per-pair support and
    confidence — the classic co-purchase mining shape.  Lift and
    confidence are each ONE division of exact integer counts (log-free,
    like the PMI collocations), so the ranking hashes identically in
    both engines; a min-support gate (n_ab >= 2) keeps rules
    statistical and the final top-k is TakeOrderedAndProject under a
    total order.  Shape at scale: the pair generation self-joins
    baskets on the order key, so fan-out is Σ|basket|² — bounded by
    the basket-size cap, NOT corpus-quadratic — and the count join
    against part supports is vocabulary-sized.  The cap (baskets with
    more than 64 distinct parts are EXCLUDED, on both engines) is the
    robustness gate every production association miner carries: one
    degenerate mega-basket would otherwise contribute |basket|^2 pairs
    and a straggler partition at 100 TB, while telling you nothing
    statistical (everything co-occurs with everything in it)."""
    li = load_table(spark, sf_dir, "lineitem")
    # no .distinct() here (r14): market_basket_rules dedups membership
    # inside its ok-keyed collect_set aggregate — a separate (ok, pk)
    # distinct was a second full exchange of the same rows.
    basket0 = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    return market_basket_rules(basket0)


def market_basket_rules(basket0: DataFrame) -> DataFrame:
    """Frame-level core of orders_market_basket over (ok, pk) basket
    membership rows — duplicates tolerated, the ok-keyed collect_set
    dedups (also driven by the mega-basket robustness probe in
    tools/scaling_probe.py)."""
    # ONE ok-keyed exchange (r14, guide §2.4): the old shape paid a
    # (ok, pk) distinct, an ok-keyed size aggregate AND an ok-keyed
    # join to re-filter the baskets. collect_set dedups and sizes in
    # the same aggregate; the explode stays partitioned by ok, so the
    # pair self-join below reuses this exchange instead of adding one.
    # ACCEPTED MEMORY BOUND (ADVICE r14): the collect_set buffer for a
    # basket materializes its full DISTINCT part set before the <= 64
    # cap discards it, so one pathological mega-basket costs
    # O(|distinct parts|) bytes in a single aggregation buffer (~tens
    # of MB for a million-part basket — heavy, not fatal; ObjectHashAgg
    # falls back to sort-based aggregation under memory pressure).
    # The alternative — a count(distinct)-then-semi-join pre-filter —
    # re-adds the second full ok-keyed exchange r14 removed and was
    # measured slower; revisit only if real data shows baskets with
    # >> 1e6 distinct parts.
    basket = (
        basket0.groupBy("ok")
        .agg(F.collect_set("pk").alias("_parts"))
        .filter(F.size("_parts") <= 64)
        .select("ok", F.explode("_parts").alias("pk"))
    )
    np_ = basket.groupBy("pk").agg(F.count(F.lit(1)).alias("n_p"))
    tot = basket.agg(F.count_distinct("ok").alias("n_orders"))
    a = basket.select("ok", F.col("pk").alias("part_a"))
    b = basket.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    na = np_.select(F.col("pk").alias("part_a"), F.col("n_p").alias("n_a"))
    nb = np_.select(F.col("pk").alias("part_b"), F.col("n_p").alias("n_b"))
    return (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a", "part_b", "n_ab", "n_a", "n_b",
            (F.col("n_ab") * 1.0 / F.col("n_a")).alias("confidence_a_to_b"),
            (
                F.col("n_ab") * F.col("n_orders") * 1.0
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(50)
    )


@register(
    "orders_revenue_concentration",
    oracle=f"""
    WITH rc AS (
      SELECT o_custkey, CAST(sum({sql_cents('o_totalprice')}) AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey),
    rt AS (SELECT o_custkey, rev,
                  CAST(ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS INT)
                    AS decile
           FROM rc),
    rtot AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM rc)
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev) AS BIGINT) AS revenue_cents,
           CAST(sum(rev) * 1000000 // rtot.total AS BIGINT) AS share_micro
    FROM rt, rtot
    GROUP BY decile, rtot.total
    """,
    tags=("analytics", "concentration", "extension"),
)
def orders_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration: lifetime spend per customer,
    cut into spend deciles, each decile's share of total revenue — the
    Pareto/whale analysis behind every 'top X% of customers drive Y%'
    statement. All money flows through exact integer cents and the
    decile cut goes through the boundary-table global_ntile (monotone
    cents buckets, broadcast offsets, NO single-partition data window),
    so every share hash-matches DuckDB's ntile under the same
    (rev desc, custkey) total order. One customer aggregate + one
    k-bounded histogram pass over a table that actually scales with
    sf."""
    from etl_8million_data__spark.operators.partitioning import global_ntile

    o = load_table(spark, sf_dir, "orders")
    rc = o.groupBy("o_custkey").agg(F.sum(cents("o_totalprice")).alias("rev"))
    tiled = global_ntile(
        rc,
        k=10,
        order_col="rev",
        tiebreak_col="o_custkey",
        bucket_expr=F.floor(F.col("rev") / 10_000_000),
        descending=True,
        out_col="decile",
    )
    tot = rc.groupBy().agg(F.sum("rev").alias("total"))
    return (
        tiled.crossJoin(F.broadcast(tot))
        .groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("revenue_cents"),
            F.expr("(sum(rev) * 1000000) div first(total)")
            .cast("bigint")
            .alias("share_micro"),
        )
    )


@register(
    "orders_ship_latency_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    d AS (SELECT priority, days, CAST(count(*) AS BIGINT) AS n_at
          FROM lat GROUP BY 1, 2),
    c AS (SELECT priority, days, n_at,
                 CAST(sum(n_at) OVER (PARTITION BY priority ORDER BY days)
                   AS BIGINT) AS cum
          FROM d),
    s AS (SELECT priority, CAST(sum(n_at) AS BIGINT) AS n,
                 CAST(max(days) AS BIGINT) AS max_days
          FROM d GROUP BY 1)
    SELECT s.priority, s.n,
           (SELECT min(days) FROM c WHERE c.priority = s.priority
             AND c.cum * 2 >= s.n) AS p50_days,
           (SELECT min(days) FROM c WHERE c.priority = s.priority
             AND c.cum * 10 >= 9 * s.n) AS p90_days,
           (SELECT min(days) FROM c WHERE c.priority = s.priority
             AND c.cum * 100 >= 99 * s.n) AS p99_days,
           s.max_days
    FROM s
    """,
    tags=("analytics", "percentiles", "latency", "extension"),
)
def orders_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order-to-ship latency percentiles per priority — the SLA
    dashboard query, computed WITHOUT a data-sized sort or an
    unpartitioned rank window: day-granular latencies live in a tiny
    value domain, so per (priority, days) counts collapse the fact to
    a VALUE HISTOGRAM (rows = |priorities| × |distinct day-counts|,
    bounded by the latency spread, not the row count) and exact
    p50/p90/p99 fall out of an integer cumulative sum over it — the
    same discipline as advisor_shuffle_skew_report, applied to an SLA
    metric. Approx-percentile sketches are the WRONG tool when the
    domain is small: exactness here is free.

    Scale shape: one fact join (lineitem ⋈ orders on the shared key)
    + one map-side-combined histogram aggregate; the percentile
    extraction windows run over the histogram only."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("days"),
    )
    d = lat.groupBy("priority", "days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at")
    )
    w = Window.partitionBy("priority").orderBy("days")
    c = d.withColumn("cum", F.sum("n_at").over(w).cast("bigint"))
    s = d.groupBy("priority").agg(
        F.sum("n_at").cast("bigint").alias("n"),
        F.max("days").cast("bigint").alias("max_days"),
    )
    pct = (
        c.join(s, "priority")
        .groupBy("priority")
        .agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("days"))).alias(
                "p50_days"
            ),
            F.min(
                F.when(F.col("cum") * 10 >= 9 * F.col("n"), F.col("days"))
            ).alias("p90_days"),
            F.min(
                F.when(F.col("cum") * 100 >= 99 * F.col("n"), F.col("days"))
            ).alias("p99_days"),
        )
    )
    return s.join(pct, "priority").select(
        "priority", "n", "p50_days", "p90_days", "p99_days", "max_days"
    )
