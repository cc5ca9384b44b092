"""Behavioral/event analytics: funnel conversion and cohort retention —
the standard product-analytics shapes over the events table, both with
exact DuckDB oracles (pure integer/timestamp logic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents, sql_cents
from etl_8million_data__spark.plans.registry import register


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'signup') AS t_signup,
             min(ts) FILTER (event_type = 'click') AS t_click,
             min(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    stages AS (
      SELECT user_id,
             (t_signup IS NOT NULL) AS s1,
             (t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_click > t_signup) AS s2,
             (t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_click > t_signup AND t_purchase IS NOT NULL
              AND t_purchase > t_click) AS s3
      FROM firsts)
    SELECT count(*) FILTER (s1) AS signed_up,
           count(*) FILTER (s2) AS clicked_after_signup,
           count(*) FILTER (s3) AS purchased_after_click,
           count(*) AS total_users
    FROM stages
    """,
    tags=("behavioral", "funnel", "agg"),
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup -> first later click -> first later
    purchase) via conditional min-timestamps — one groupBy, no joins,
    no per-user iteration."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    stages = firsts.select(s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return stages.agg(
        cnt("s1").alias("signed_up"),
        cnt("s2").alias("clicked_after_signup"),
        cnt("s3").alias("purchased_after_click"),
        F.count(F.lit(1)).alias("total_users"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH weeks AS (
      SELECT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    cohorts AS (
      SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY user_id),
    activity AS (
      SELECT DISTINCT w.user_id, c.cohort_week,
             CAST((w.wk - c.cohort_week) / 7 AS INTEGER) AS week_offset
      FROM weeks w JOIN cohorts c ON w.user_id = c.user_id)
    SELECT cohort_week, week_offset, count(*) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("behavioral", "cohort", "retention"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort = week of first activity,
    cell = distinct users active at each week offset."""
    e = load_table(spark, sf_dir, "events")
    weeks = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        weeks.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    tags=("behavioral", "window", "extension"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    of each user: one lag window partitioned by user (shuffle keyed on
    user_id scales out; no global sort), then a tiny |types|^2
    aggregate. (ts, event_id) ordering makes ties deterministic in both
    engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "events_value_outliers_zscore",
    oracle=f"""
    WITH c AS (
      SELECT event_type, event_id, {sql_cents('value')} AS v FROM events),
    g AS (
      SELECT event_type, count(*) AS n, sum(v) AS s, sum(v*v) AS ssq
      FROM c GROUP BY event_type)
    SELECT c.event_type, c.event_id, c.v AS value_cents
    FROM c JOIN g USING (event_type)
    WHERE (c.v*n - s) * (c.v*n - s) > 9 * (n*ssq - s*s)
    """,
    tags=("behavioral", "outliers", "exact", "extension"),
)
def events_value_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outliers per event_type with EXACT membership: the
    z-score test |v - mean| > 3*sigma is cleared of division and sqrt
    by multiplying through by n^2 — (v*n - s)^2 > 9*(n*ssq - s^2) — so
    the decision is pure integer-cents arithmetic and both engines flag
    the identical row set (float sigma would disagree at the boundary).
    One scan computes the per-type moments (5 groups, broadcast back),
    one scan filters; the squared terms go through decimal(38,0) so the
    test survives group sums far past bigint range."""
    e = load_table(spark, sf_dir, "events")
    c = e.select("event_type", "event_id", cents("value").alias("v"))
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        # cast each term BEFORE summing: v~10^7 cents squared is 10^14
        # per row, so a bigint accumulator overflows around 10^5
        # rows/group — the decimal(38,0) sum matches DuckDB's int128.
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("ssq"),
    )
    D = "decimal(38,0)"
    dev = (F.col("v") * F.col("n") - F.col("s")).cast(D)
    spread = F.col("n").cast(D) * F.col("ssq") - F.col("s").cast(D) * F.col("s")
    return (
        c.join(F.broadcast(g), "event_type")
        .filter(dev * dev > 9 * spread)
        .select("event_type", "event_id", F.col("v").alias("value_cents"))
    )


@register(
    "events_frequent_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT user_id, p2 || '>' || p1 || '>' || event_type AS path
      FROM seq WHERE p2 IS NOT NULL)
    SELECT path, count(*) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_occurrences DESC, path LIMIT 20
    """,
    tags=("behavioral", "sequence", "extension"),
)
def events_frequent_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-sequence mining, order-3: the top-20 consecutive
    event-type paths a>b>c across all user timelines, with occurrence
    and distinct-user support — the path-analysis complement of the
    first-order Markov transition counts (where common journeys hide
    inside pairwise edges).  One user-keyed window (two lags share it),
    then a |types|^3-bounded aggregate and a TakeOrderedAndProject
    top-k with a total-order tie-break; (ts, event_id) ordering makes
    ties deterministic in both engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    path = F.concat_ws(">", F.col("p2"), F.col("p1"), F.col("event_type"))
    return (
        seq.select("user_id", path.alias("path"))
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(20)
    )


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH q AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             {sql_cents('c_acctbal')} // 100000 AS acctbal_band
      FROM customer)
    SELECT c_nationkey, c_mktsegment, acctbal_band,
           count(*) AS group_size,
           (count(*) < 5) AS below_k
    FROM q GROUP BY 1, 2, 3
    """,
    tags=("privacy", "audit", "extension"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, $1000 account-balance band): every equivalence
    class with its size and a below-k flag (k = 5) — the groups a
    release would have to suppress or generalize further, the
    standard privacy gate before sharing curated data.  The balance
    band divides EXACT integer cents; Spark's double-divide + cast and
    DuckDB's integer ``//`` BOTH truncate toward zero (negative
    balances included — TPC-H acctbal goes to -999.99), so class
    membership is engine-portable; one hash aggregate on the
    quasi-identifier key, nothing else."""
    c = load_table(spark, sf_dir, "customer")
    band = (cents(F.col("c_acctbal")) / 100000).cast("long")
    q = c.select(
        "c_nationkey", "c_mktsegment", band.alias("acctbal_band")
    )
    n = F.count(F.lit(1))
    return q.groupBy("c_nationkey", "c_mktsegment", "acctbal_band").agg(
        n.alias("group_size"), (n < 5).alias("below_k")
    )


@register(
    "events_value_outliers_mad",
    oracle=f"""
    WITH c AS (
      SELECT event_type, event_id, {sql_cents('value')} AS v FROM events),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS med FROM c GROUP BY 1),
    dev AS (
      SELECT c.event_type, c.event_id, c.v, m.med, abs(c.v - m.med) AS d
      FROM c JOIN med m ON m.event_type = c.event_type),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type, d.event_id, d.v AS value_cents,
           0.6745 * (d.v - d.med) / m.mad AS robust_z
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    WHERE m.mad > 0 AND abs(0.6745 * (d.v - d.med) / m.mad) > 3.5
    """,
    tags=("behavioral", "robust-stats", "outlier", "extension"),
)
def events_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via the modified z-score
    0.6745·(x − median)/MAD (Iglewicz–Hoaglin, |Mz| > 3.5) — the
    median/MAD twin of events_value_outliers_zscore: mean/std move
    WITH the outliers they are supposed to flag (masking), the median
    and MAD do not, so this detector survives heavy-tailed value
    distributions where the z-score's threshold silently loosens.
    Exactness: values are integer cents, both engines interpolate the
    median with the same (n−1)·p rule, deviations are exact halves,
    and the final score is a single multiply-divide — bit-identical.
    Types whose MAD is 0 (a majority-constant value) are excluded on
    both sides rather than divided by zero.  Shape at scale: two
    type-keyed aggregates + broadcast joins of the |types|-sized
    median/MAD tables against the fact scan."""
    e = load_table(spark, sf_dir, "events")
    c = e.select("event_type", "event_id", cents("value").alias("v"))
    med = c.groupBy("event_type").agg(
        F.percentile(F.col("v"), F.lit(0.5)).alias("med")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "v", "med",
        F.abs(F.col("v") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("d"), F.lit(0.5)).alias("mad")
    )
    rz = 0.6745 * (F.col("v") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) > 3.5))
        .select(
            "event_type",
            "event_id",
            F.col("v").alias("value_cents"),
            rz.alias("robust_z"),
        )
    )


def _pagerank_ctes(n_iter: int, d_num: int = 85, d_den: int = 100,
                   scale: int = 1_000_000_000) -> str:
    parts = [
        """ed AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM (SELECT user_id, event_type,
                   lag(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events)
      WHERE prev_type IS NOT NULL GROUP BY 1, 2)""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed))""",
        """ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM ed GROUP BY src)""",
        """ew AS (SELECT e.src, e.dst, e.w, o.w_out FROM ed e JOIN ow o USING (src))""",
        """nn AS (SELECT count(*) AS n FROM nodes)""",
        f"""r0 AS (
      SELECT node, CAST({scale} // n AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn)""",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f"""c{k} AS (
      SELECT ew.dst AS node,
             CAST(sum((({d_num} * r.rank) * ew.w) // ({d_den} * ew.w_out))
                  AS BIGINT) AS inflow
      FROM ew JOIN r{k - 1} r ON r.node = ew.src GROUP BY 1)"""
        )
        parts.append(
            f"""r{k} AS (
      SELECT nodes.node,
             CAST(((CAST({d_den - d_num} AS BIGINT) * {scale}) // {d_den}) // nn.n
                  + coalesce(c{k}.inflow, 0) AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN c{k} ON c{k}.node = nodes.node)"""
        )
    return "WITH " + ",\n    ".join(parts)


@register(
    "events_type_pagerank",
    oracle=f"""
    {_pagerank_ctes(3)}
    SELECT node, rank AS rank_fixed FROM r3
    """,
    tags=("behavioral", "graph", "pagerank", "iterative", "extension"),
)
def events_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-weighted PageRank over the event-type transition graph
    (edges = Markov transition counts), 3 power iterations in EXACT
    integer fixed-point: per-edge flow is the truncated division
    (85·r·w) div (100·w_out) in 1e-9 rank units, so Spark's ``div``
    and DuckDB's ``//`` (both truncate toward zero) yield
    bit-identical ranks with zero float accumulation — the oracle
    unrolls the full power iteration CTE-per-round, the same
    exactly-checked-iterative-loop contract as the k-means trainer
    and the BPE merges.  Each round is one rank⋈edge join + one
    dst-keyed aggregation (the canonical distributed PageRank step);
    the driver loop carries only the round index.  The graph here is
    |types|-sized, but the plan is the one you'd run node-partitioned
    at web scale; truncation/dangling mass is dropped (ranks are a
    RANKING signal, not a distribution)."""
    from pyspark.sql.window import Window

    from etl_8million_data__spark.operators.graph import pagerank_weighted

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank_weighted(edges, n_iter=3).select(
        "node", F.col("rank_fixed")
    )


@register(
    "privacy_l_diversity",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             {sql_cents('c_acctbal')} // 100000 AS sens_band
      FROM customer),
    cls AS (
      SELECT c_nationkey, c_mktsegment, sens_band,
             CAST(count(*) AS BIGINT) AS n_v
      FROM q GROUP BY 1, 2, 3)
    SELECT c_nationkey, c_mktsegment,
           CAST(sum(n_v) AS BIGINT) AS group_size,
           CAST(count(*) AS BIGINT) AS n_distinct_sensitive,
           (count(*) < 3) AS below_l,
           CAST((1000000 * max(n_v)) // sum(n_v) AS BIGINT)
             AS top_sensitive_share_micro
    FROM cls GROUP BY 1, 2
    """,
    tags=("privacy", "audit", "extension"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attack k-anonymity misses: a
    quasi-identifier class can be large (k-anonymous) yet reveal its
    members' SENSITIVE value when every member shares one. Per QI class
    (nation, market segment): the number of distinct sensitive values
    (the $1000 balance band plays the sensitive attribute), a below-l
    flag (l = 3 — distinct l-diversity), and the most-common sensitive
    value's share in integer micro — the homogeneity measure behind
    recursive (c,l)-diversity, without the engine-varying log of
    entropy l-diversity. Two hash aggregates (class × value, then
    class), nothing else; the band divides exact integer cents with
    truncation-toward-zero on both engines."""
    c = load_table(spark, sf_dir, "customer")
    band = (cents(F.col("c_acctbal")) / 100000).cast("long")
    cls = (
        c.select("c_nationkey", "c_mktsegment", band.alias("sens_band"))
        .groupBy("c_nationkey", "c_mktsegment", "sens_band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_v"))
    )
    n = F.count(F.lit(1))
    return cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_v").cast("bigint").alias("group_size"),
        n.cast("bigint").alias("n_distinct_sensitive"),
        (n < 3).alias("below_l"),
        F.expr("(1000000 * max(n_v)) div sum(n_v)")
        .cast("bigint")
        .alias("top_sensitive_share_micro"),
    )




# SNM window for the linkage candidate generator: true pairs sit at
# most ~9 positions apart in the merged name order (the truncated copy
# sorts as a prefix immediately before its source's 10-key name block,
# with at most 2 other same-truncation copies between), so 16 covers
# with margin — gated by tests/test_linkage_blocking.py's recall
# assertion against the constructed ground truth.
_LINK_W = 16

_LINK_CTES = f"""
    b AS (
      SELECT c_custkey + 1000000 AS rid, c_custkey AS orig_key,
             substr(c_name, 1, length(c_name) - 1) AS name,
             CASE WHEN c_custkey % 8 = 0 THEN {sql_cents('c_acctbal')}
                  ELSE {sql_cents('c_acctbal')} + 1 END AS bal,
             c_mktsegment AS seg
      FROM customer WHERE c_custkey % 4 = 0),
    m AS (
      SELECT c_custkey AS rid, CAST(NULL AS BIGINT) AS orig_key,
             c_name AS name, {sql_cents('c_acctbal')} AS bal,
             c_mktsegment AS seg, 0 AS src
      FROM customer
      UNION ALL
      SELECT rid, orig_key, name, bal, seg, 1 AS src FROM b),
    rk AS (SELECT m.*, row_number() OVER (ORDER BY name, rid) AS pos FROM m),
    cand AS (
      SELECT l.src AS src_l, l.rid AS rid_l, l.orig_key AS orig_l,
             l.name AS name_l, l.bal AS bal_l, l.seg AS seg_l,
             r.rid AS rid_r, r.orig_key AS orig_r,
             r.name AS name_r, r.bal AS bal_r, r.seg AS seg_r
      FROM rk l JOIN rk r
        ON r.pos > l.pos AND r.pos <= l.pos + {_LINK_W} AND l.src <> r.src),
    pairs AS (
      SELECT CASE WHEN src_l = 0 THEN rid_l ELSE rid_r END AS a_key,
             CASE WHEN src_l = 1 THEN rid_l ELSE rid_r END AS b_key,
             coalesce(orig_l, orig_r) AS orig_key,
             CASE WHEN substr(CASE WHEN src_l = 0 THEN name_l ELSE name_r END, 1, 15)
                     = substr(CASE WHEN src_l = 1 THEN name_l ELSE name_r END, 1, 15)
                  THEN 1 ELSE 0 END AS ag_name,
             CASE WHEN (CASE WHEN src_l = 0 THEN bal_l ELSE bal_r END)
                     = (CASE WHEN src_l = 1 THEN bal_l ELSE bal_r END)
                  THEN 1 ELSE 0 END AS ag_bal,
             CASE WHEN (CASE WHEN src_l = 0 THEN seg_l ELSE seg_r END)
                     = (CASE WHEN src_l = 1 THEN seg_l ELSE seg_r END)
                  THEN 1 ELSE 0 END AS ag_seg
      FROM cand),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
    mname AS (SELECT CAST(sum(_n * (_n - 1)) AS BIGINT) AS mass FROM
              (SELECT count(*) AS _n FROM m GROUP BY substr(name, 1, 15)) t),
    mbal AS (SELECT CAST(sum(_n * (_n - 1)) AS BIGINT) AS mass FROM
             (SELECT count(*) AS _n FROM m GROUP BY bal) t),
    mseg AS (SELECT CAST(sum(_n * (_n - 1)) AS BIGINT) AS mass FROM
             (SELECT count(*) AS _n FROM m GROUP BY seg) t),
    u AS (
      SELECT CAST((1000000 * mname.mass) // (nn.n * (nn.n - 1)) AS BIGINT) AS u_name,
             CAST((1000000 * mbal.mass) // (nn.n * (nn.n - 1)) AS BIGINT) AS u_bal,
             CAST((1000000 * mseg.mass) // (nn.n * (nn.n - 1)) AS BIGINT) AS u_seg
      FROM mname, mbal, mseg, nn)
"""


def _linkage_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both linkage files in one frame: the clean customer file
    (src=0) and its deterministically corrupted copy (src=1 — name
    truncated one char, balance off by one cent for 7/8 of records,
    segment kept; every 4th customer). Ground truth is ``orig_key``
    (null on the clean side)."""
    c = load_table(spark, sf_dir, "customer")
    b = c.filter(F.col("c_custkey") % 4 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("rid"),
        F.col("c_custkey").alias("orig_key"),
        F.expr("substr(c_name, 1, length(c_name) - 1)").alias("name"),
        F.when(F.col("c_custkey") % 8 == 0, cents("c_acctbal"))
        .otherwise(cents("c_acctbal") + 1)
        .alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(1).alias("src"),
    )
    a = c.select(
        F.col("c_custkey").alias("rid"),
        F.lit(None).cast("bigint").alias("orig_key"),
        F.col("c_name").alias("name"),
        cents("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(0).alias("src"),
    )
    return a.unionByName(b)


def _linkage_candidate_pairs(merged: DataFrame) -> DataFrame:
    """Bounded-volume candidate generator: SORTED-NEIGHBORHOOD over the
    merged name order (the dedup family's SNM discipline applied to
    record linkage — replaces round 9's nation blocking whose
    Σ(block²) candidates grew quadratically). Global name rank comes
    from the boundary-table :func:`global_rank` (bucket = 14-char name
    prefix, monotone in the sort key — never an unpartitioned
    data-sized window); each record pairs with its ``_LINK_W``
    successors via an EQUI-join on the integer rank, so candidate
    volume is exactly N·w — linear however large the files are — and
    only cross-file pairs survive. Output: (a_key, b_key, orig_key,
    ag_name, ag_bal, ag_seg), one row per unordered cross-file pair."""
    from etl_8million_data__spark.operators.partitioning import global_rank

    ranked = global_rank(
        merged, "name", "rid", F.substring("name", 1, 14), out_col="pos"
    ).localCheckpoint(eager=True)
    left = (
        ranked.select(
            F.col("src").alias("src_l"),
            F.col("rid").alias("rid_l"),
            F.col("orig_key").alias("orig_l"),
            F.col("name").alias("name_l"),
            F.col("bal").alias("bal_l"),
            F.col("seg").alias("seg_l"),
            "pos",
        )
        .select("*", F.explode(F.sequence(F.lit(1), F.lit(_LINK_W))).alias("_i"))
        .withColumn("pos2", F.col("pos") + F.col("_i"))
    )
    right = ranked.select(
        F.col("pos").alias("pos2"),
        F.col("src").alias("src_r"),
        F.col("rid").alias("rid_r"),
        F.col("orig_key").alias("orig_r"),
        F.col("name").alias("name_r"),
        F.col("bal").alias("bal_r"),
        F.col("seg").alias("seg_r"),
    )
    cand = left.join(right, "pos2").filter(F.col("src_l") != F.col("src_r"))
    fa = lambda l, r: F.when(F.col("src_l") == 0, F.col(l)).otherwise(F.col(r))  # noqa: E731
    fb = lambda l, r: F.when(F.col("src_l") == 1, F.col(l)).otherwise(F.col(r))  # noqa: E731
    return cand.select(
        fa("rid_l", "rid_r").alias("a_key"),
        fb("rid_l", "rid_r").alias("b_key"),
        F.coalesce("orig_l", "orig_r").alias("orig_key"),
        F.when(
            F.substring(fa("name_l", "name_r"), 1, 15)
            == F.substring(fb("name_l", "name_r"), 1, 15),
            1,
        )
        .otherwise(0)
        .alias("ag_name"),
        F.when(fa("bal_l", "bal_r") == fb("bal_l", "bal_r"), 1)
        .otherwise(0)
        .alias("ag_bal"),
        F.when(fa("seg_l", "seg_r") == fb("seg_l", "seg_r"), 1)
        .otherwise(0)
        .alias("ag_seg"),
    )


def _linkage_u_frame(merged: DataFrame) -> DataFrame:
    """One-row frame of FREQUENCY-BASED u-probabilities: u_field =
    P(two random records from the merged file agree on the field) =
    Σ_v n_v·(n_v−1) / (N·(N−1)) in integer micro — the textbook
    chance-agreement estimate computed from per-value counts alone
    (one narrow groupBy per field, NO pair materialization), so u is
    independent of the blocking scheme. Round 9 estimated u over the
    nation-blocked candidate pairs; under SNM blocking that estimate
    would be contaminated (name-adjacent candidates mostly agree on
    the name prefix, pushing u_name above m and inverting the weight),
    which is exactly why deployments estimate u from value frequencies
    instead."""

    def mass(expr, alias: str) -> DataFrame:
        return (
            merged.groupBy(expr.alias("_v"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.sum(F.expr("_n * (_n - 1)")).cast("bigint").alias(alias))
        )

    tot = merged.agg(F.count(F.lit(1)).cast("bigint").alias("_N"))
    return (
        mass(F.substring("name", 1, 15), "_m_name")
        .crossJoin(F.broadcast(mass(F.col("bal"), "_m_bal")))
        .crossJoin(F.broadcast(mass(F.col("seg"), "_m_seg")))
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr("(1000000 * _m_name) div (_N * (_N - 1))")
            .cast("bigint")
            .alias("u_name"),
            F.expr("(1000000 * _m_bal) div (_N * (_N - 1))")
            .cast("bigint")
            .alias("u_bal"),
            F.expr("(1000000 * _m_seg) div (_N * (_N - 1))")
            .cast("bigint")
            .alias("u_seg"),
        )
    )


def _linkage_weight():
    """Fellegi–Sunter pattern weight as an integer column (assumed
    m = 0.9, u columns in micro, truncating division, +1 smoothing —
    log-free so it hash-matches across engines). Expects the ag_* flags
    and the broadcast u columns in scope."""
    return (
        F.when(
            F.col("ag_name") == 1, F.expr("900000000000 div (u_name + 1)")
        ).otherwise(F.expr("100000000000 div (1000001 - u_name)"))
        + F.when(
            F.col("ag_bal") == 1, F.expr("900000000000 div (u_bal + 1)")
        ).otherwise(F.expr("100000000000 div (1000001 - u_bal)"))
        + F.when(
            F.col("ag_seg") == 1, F.expr("900000000000 div (u_seg + 1)")
        ).otherwise(F.expr("100000000000 div (1000001 - u_seg)"))
    )


@register(
    "linkage_agreement_patterns",
    oracle=f"""
    WITH {_LINK_CTES}
    SELECT p.ag_name, p.ag_bal, p.ag_seg,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN p.a_key = p.orig_key THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_matches,
           CAST(  (CASE WHEN p.ag_name = 1
                        THEN 900000000000 // (u.u_name + 1)
                        ELSE 100000000000 // (1000001 - u.u_name) END)
                + (CASE WHEN p.ag_bal = 1
                        THEN 900000000000 // (u.u_bal + 1)
                        ELSE 100000000000 // (1000001 - u.u_bal) END)
                + (CASE WHEN p.ag_seg = 1
                        THEN 900000000000 // (u.u_seg + 1)
                        ELSE 100000000000 // (1000001 - u.u_seg) END)
             AS BIGINT) AS pattern_weight,
           u.u_name, u.u_bal, u.u_seg
    FROM pairs p CROSS JOIN u
    GROUP BY 1, 2, 3, u.u_name, u.u_bal, u.u_seg
    """,
    tags=("linkage", "entity-resolution", "extension"),
)
def linkage_agreement_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECORD LINKAGE (Fellegi–Sunter form): agreement-pattern table
    for matching the clean customer file against a deterministically
    CORRUPTED copy (name truncated one char, balance off by one cent
    for 7/8 of records, segment kept — the classic dirty-merge shape).
    Candidates come from a SORTED-NEIGHBORHOOD pass over the merged
    name order (window 16, boundary-table global rank — see
    :func:`_linkage_candidate_pairs`), replacing round 9's
    nation-blocked join whose Σ(block²) candidate count was the one
    quadratic generator left in the registry: SNM volume is exactly
    N·w, and the fixture's truncation corruption keeps every true pair
    within the window (recall gate in tests/test_linkage_blocking.py).
    Per agreement pattern over (name-prefix-15, balance-cents-exact,
    segment-exact): candidate-pair count, TRUE-match count (ground
    truth known by construction), and the pattern's match weight from
    FREQUENCY-BASED u-probabilities (:func:`_linkage_u_frame` —
    value-count chance-agreement, blocking-independent) with assumed
    m = 0.9. Weights are ratio-of-integer-micro with truncating
    division and +1 smoothing — log-free so the whole table
    hash-matches; a deployment takes log downstream (rank-preserving,
    turning odds products into the familiar weight sums).

    Scale shape: one boundary-table global rank + one integer
    equi-join bounded at N·w rows + three narrow value-count
    aggregates; the u frame is ONE row broadcast back; output is <= 8
    pattern rows."""
    merged = _linkage_merged(spark, sf_dir)
    pairs = _linkage_candidate_pairs(merged)
    u = _linkage_u_frame(merged)
    w = _linkage_weight()
    return (
        pairs.crossJoin(F.broadcast(u))
        .groupBy("ag_name", "ag_bal", "ag_seg", "u_name", "u_bal", "u_seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("a_key") == F.col("orig_key"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_true_matches"),
            F.max(w).cast("bigint").alias("pattern_weight"),
        )
        .select(
            "ag_name", "ag_bal", "ag_seg", "n_pairs", "n_true_matches",
            "pattern_weight", "u_name", "u_bal", "u_seg",
        )
    )


@register(
    "linkage_threshold_quality",
    oracle=f"""
    WITH {_LINK_CTES},
    pat AS (
      SELECT p.ag_name, p.ag_bal, p.ag_seg,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN p.a_key = p.orig_key THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true,
             CAST(  (CASE WHEN p.ag_name = 1
                          THEN 900000000000 // (u.u_name + 1)
                          ELSE 100000000000 // (1000001 - u.u_name) END)
                  + (CASE WHEN p.ag_bal = 1
                          THEN 900000000000 // (u.u_bal + 1)
                          ELSE 100000000000 // (1000001 - u.u_bal) END)
                  + (CASE WHEN p.ag_seg = 1
                          THEN 900000000000 // (u.u_seg + 1)
                          ELSE 100000000000 // (1000001 - u.u_seg) END)
               AS BIGINT) AS w
      FROM pairs p CROSS JOIN u
      GROUP BY 1, 2, 3, u.u_name, u.u_bal, u.u_seg),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_true FROM b),
    thr AS (SELECT DISTINCT w AS threshold FROM pat)
    SELECT t.threshold,
           CAST(sum(CASE WHEN p.w >= t.threshold THEN p.n_true ELSE 0 END)
             AS BIGINT) AS tp,
           CAST(sum(CASE WHEN p.w >= t.threshold
                         THEN p.n_pairs - p.n_true ELSE 0 END) AS BIGINT) AS fp,
           CAST(x.total_true
                - sum(CASE WHEN p.w >= t.threshold THEN p.n_true ELSE 0 END)
             AS BIGINT) AS fn,
           CAST((1000000 * sum(CASE WHEN p.w >= t.threshold THEN p.n_true
                                    ELSE 0 END))
                // greatest(sum(CASE WHEN p.w >= t.threshold THEN p.n_pairs
                                     ELSE 0 END), 1) AS BIGINT)
             AS precision_micro,
           CAST((1000000 * sum(CASE WHEN p.w >= t.threshold THEN p.n_true
                                    ELSE 0 END)) // x.total_true AS BIGINT)
             AS recall_micro
    FROM thr t CROSS JOIN pat p CROSS JOIN tot x
    GROUP BY t.threshold, x.total_true
    """,
    tags=("linkage", "entity-resolution", "evaluation", "extension"),
)
def linkage_threshold_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The linkage DECISION layer: precision/recall at every candidate
    match threshold (the distinct pattern weights — the only points
    where the decision changes), computed against the constructed
    ground truth. This is the curve a deployment reads to place the
    Fellegi–Sunter upper/lower thresholds: patterns above the chosen
    weight are auto-matches, and the table shows exactly what each
    choice costs in false positives vs missed matches. The recall
    denominator is the TRUE total of corrupted records (|b|), not the
    candidate-covered subset — so a blocking scheme that silently
    dropped true pairs would show up as irreducible fn here instead of
    hiding (blocking-aware evaluation; the SNM window's fixture recall
    is separately gated at 1.0). All counts are integers over the
    <= 8-row pattern table crossed with its own distinct weights —
    after the one bounded candidate pass, the whole tuning curve is
    constant-time however large the files are."""
    pat = linkage_agreement_patterns(spark, sf_dir).select(
        F.col("pattern_weight").alias("w"),
        "n_pairs",
        F.col("n_true_matches").alias("n_true"),
    ).localCheckpoint(eager=True)
    tot = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 4 == 0)
        .agg(F.count(F.lit(1)).cast("bigint").alias("total_true"))
    )
    thr = pat.select(F.col("w").alias("threshold")).distinct()
    hit = F.when(F.col("w") >= F.col("threshold"), F.col("n_true")).otherwise(0)
    hit_pairs = F.when(F.col("w") >= F.col("threshold"), F.col("n_pairs")).otherwise(0)
    return (
        thr.crossJoin(pat)
        .crossJoin(F.broadcast(tot))
        .groupBy("threshold", "total_true")
        .agg(
            F.sum(hit).cast("bigint").alias("tp"),
            F.sum(
                F.when(
                    F.col("w") >= F.col("threshold"),
                    F.col("n_pairs") - F.col("n_true"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            (F.col("total_true") - F.sum(hit)).cast("bigint").alias("fn"),
            F.expr(
                "(1000000 * sum(CASE WHEN w >= threshold THEN n_true ELSE 0 END))"
                " div greatest(sum(CASE WHEN w >= threshold THEN n_pairs"
                " ELSE 0 END), 1)"
            )
            .cast("bigint")
            .alias("precision_micro"),
            F.expr(
                "(1000000 * sum(CASE WHEN w >= threshold THEN n_true ELSE 0 END))"
                " div total_true"
            )
            .cast("bigint")
            .alias("recall_micro"),
        )
        .drop("total_true")
    )


@register(
    "linkage_e2e_golden_records",
    oracle=f"""
    WITH RECURSIVE {_LINK_CTES},
    wp AS MATERIALIZED (
      SELECT p.a_key, p.b_key, p.orig_key,
             CAST(  (CASE WHEN p.ag_name = 1
                          THEN 900000000000 // (u.u_name + 1)
                          ELSE 100000000000 // (1000001 - u.u_name) END)
                  + (CASE WHEN p.ag_bal = 1
                          THEN 900000000000 // (u.u_bal + 1)
                          ELSE 100000000000 // (1000001 - u.u_bal) END)
                  + (CASE WHEN p.ag_seg = 1
                          THEN 900000000000 // (u.u_seg + 1)
                          ELSE 100000000000 // (1000001 - u.u_seg) END)
               AS BIGINT) AS w
      FROM pairs p CROSS JOIN u),
    pat AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN a_key = orig_key THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true
      FROM wp GROUP BY w),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_true FROM b),
    curve AS (
      SELECT t.w AS threshold,
             CAST(sum(CASE WHEN p.w >= t.w THEN p.n_true ELSE 0 END) AS BIGINT)
               AS tp,
             CAST(sum(CASE WHEN p.w >= t.w THEN p.n_pairs - p.n_true
                           ELSE 0 END) AS BIGINT) AS fp
      FROM (SELECT DISTINCT w FROM pat) t CROSS JOIN pat p GROUP BY t.w),
    best AS (
      SELECT threshold FROM curve CROSS JOIN tot
      ORDER BY (2000000 * tp) // (tp + fp + total_true) DESC, threshold DESC
      LIMIT 1),
    matched AS MATERIALIZED (
      SELECT a_key, b_key FROM wp CROSS JOIN best WHERE wp.w >= best.threshold),
    edges AS (
      SELECT a_key AS src, b_key AS dst FROM matched
      UNION ALL SELECT b_key, a_key FROM matched),
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT k.src, e.dst FROM walk k JOIN edges e ON k.dst = e.src),
    compm AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM walk GROUP BY src),
    rec AS (
      SELECT m.*, coalesce(c.component, m.rid) AS component
      FROM m LEFT JOIN compm c ON c.node = m.rid),
    stats AS (
      SELECT component,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(count(DISTINCT src) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT coalesce(orig_key, rid)) AS BIGINT)
               AS n_true_entities,
             max(length(name)) AS maxlen
      FROM rec GROUP BY component)
    SELECT r.component,
           s.n_members, s.n_sources, s.n_true_entities,
           min(r.name) FILTER (length(r.name) = s.maxlen) AS golden_name,
           coalesce(min(CASE WHEN r.src = 0 THEN r.bal END), min(r.bal))
             AS golden_bal,
           coalesce(min(CASE WHEN r.src = 0 THEN r.seg END), min(r.seg))
             AS golden_seg
    FROM rec r JOIN stats s USING (component)
    GROUP BY r.component, s.n_members, s.n_sources, s.n_true_entities, s.maxlen
    """,
    tags=("linkage", "entity-resolution", "survivorship", "extension"),
)
def linkage_e2e_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY-RESOLUTION CAPSTONE — golden records: compose the whole
    linkage family into its deliverable, mirroring
    corpus_e2e_curation's composition-of-audited-stages pattern.
    Stage 1 (decide): per-pair Fellegi–Sunter weights over the SNM
    candidates, thresholded at the weight the precision/recall curve
    itself picks — max integer-micro F1 = 2·tp/(2·tp+fp+fn), ties to
    the HIGHER (more precise) threshold, so the decision point is
    derived in-frame, not hand-tuned. Stage 2 (resolve): accepted
    match pairs become undirected edges; connected components over ALL
    records (singletons stay their own entity) form the entities —
    the dedup_multi_evidence_components machinery. Stage 3 (survive):
    one golden record per entity with field-level survivorship —
    golden_name = most-complete (longest, ties lexicographic min),
    golden_bal / golden_seg = source-precedence (the clean file is
    authoritative; corrupted-only entities fall back to their own
    values) — plus the audit columns a deployment reviews:
    n_members, n_sources (1 = unmatched record), and n_true_entities
    (constructed ground truth: >1 exposes an over-merge, which the
    fixture's (1,0,1)-pattern false positives genuinely produce at the
    picked threshold).

    Scale shape: every stage is the audited sub-quadratic form — N·w
    candidates, pattern-table-sized threshold selection, min-label
    propagation over match edges (clique diameter rounds), and two
    component-keyed aggregates; nothing rescans the files after the
    one SNM pass. Oracle: recursive-CTE closure over the identical
    decided edge set (MATERIALIZED + DISTINCT-over-UNION-ALL per the
    DuckDB dialect canary)."""
    from etl_8million_data__spark.operators.graph import connected_components

    merged = _linkage_merged(spark, sf_dir).localCheckpoint(eager=True)
    pairs = _linkage_candidate_pairs(merged)
    u = _linkage_u_frame(merged)
    wp = (
        pairs.crossJoin(F.broadcast(u))
        .withColumn("w", _linkage_weight().cast("bigint"))
        .localCheckpoint(eager=True)
    )
    pat = wp.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("a_key") == F.col("orig_key"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
    )
    tot = merged.filter(F.col("src") == 1).agg(
        F.count(F.lit(1)).cast("bigint").alias("total_true")
    )
    thr = pat.select(F.col("w").alias("threshold")).distinct()
    curve = (
        thr.crossJoin(pat)
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("w") >= F.col("threshold"), F.col("n_true")).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("w") >= F.col("threshold"),
                    F.col("n_pairs") - F.col("n_true"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
        )
    )
    best = (
        curve.crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            F.expr("(2000000 * tp) div (tp + fp + total_true)").alias("_f1"),
        )
        .orderBy(F.desc("_f1"), F.desc("threshold"))
        .limit(1)
        .select("threshold")
    )
    matched = (
        wp.crossJoin(F.broadcast(best))
        .filter(F.col("w") >= F.col("threshold"))
        .select("a_key", "b_key")
        .localCheckpoint(eager=True)
    )
    comp = connected_components(
        merged.select("rid"), matched, node_col="rid", src_col="a_key", dst_col="b_key"
    )
    rec = merged.join(
        comp.select(F.col("node").alias("rid"), "component"), "rid"
    ).localCheckpoint(eager=True)
    stats = rec.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.countDistinct("src").cast("bigint").alias("n_sources"),
        F.countDistinct(F.coalesce("orig_key", "rid"))
        .cast("bigint")
        .alias("n_true_entities"),
        F.max(F.length("name")).alias("maxlen"),
    )
    return (
        rec.join(stats, "component")
        .groupBy("component", "n_members", "n_sources", "n_true_entities", "maxlen")
        .agg(
            F.min(
                F.when(F.length("name") == F.col("maxlen"), F.col("name"))
            ).alias("golden_name"),
            F.coalesce(
                F.min(F.when(F.col("src") == 0, F.col("bal"))), F.min("bal")
            ).alias("golden_bal"),
            F.coalesce(
                F.min(F.when(F.col("src") == 0, F.col("seg"))), F.min("seg")
            ).alias("golden_seg"),
        )
        .select(
            "component", "n_members", "n_sources", "n_true_entities",
            "golden_name", "golden_bal", "golden_seg",
        )
    )


@register(
    "privacy_t_closeness",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             {sql_cents('c_acctbal')} // 100000 AS sens_band
      FROM customer),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
    gv AS (SELECT sens_band, CAST(count(*) AS BIGINT) AS g_v
           FROM q GROUP BY 1),
    cls AS (SELECT c_nationkey, c_mktsegment, sens_band,
                   CAST(count(*) AS BIGINT) AS n_cv
            FROM q GROUP BY 1, 2, 3),
    csz AS (SELECT c_nationkey, c_mktsegment,
                   CAST(sum(n_cv) AS BIGINT) AS n_c
            FROM cls GROUP BY 1, 2),
    mat AS (
      SELECT s.c_nationkey, s.c_mktsegment, s.n_c, g.sens_band, g.g_v,
             coalesce(c.n_cv, 0) AS n_cv, tot.n
      FROM csz s CROSS JOIN gv g CROSS JOIN tot
      LEFT JOIN cls c ON c.c_nationkey = s.c_nationkey
                     AND c.c_mktsegment = s.c_mktsegment
                     AND c.sens_band = g.sens_band)
    SELECT c_nationkey, c_mktsegment,
           CAST(min(n_c) AS BIGINT) AS group_size,
           CAST(sum(abs((1000000 * n_cv) // n_c - (1000000 * g_v) // n)) // 2
             AS BIGINT) AS tv_distance_micro,
           (CAST(sum(abs((1000000 * n_cv) // n_c - (1000000 * g_v) // n)) // 2
             AS BIGINT) > 200000) AS above_t
    FROM mat GROUP BY 1, 2
    """,
    tags=("privacy", "audit", "extension"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the privacy-release
    ladder (k-anonymity: classes big enough; l-diversity: sensitive
    values varied enough; t-closeness: the class's sensitive
    DISTRIBUTION close enough to the global one that membership leaks
    little). Per QI class (nation, market segment) vs the $1000
    balance band: total-variation distance — ½ Σ_v |p(v|class) −
    p(v)| — which IS the earth-mover's distance for categorical values
    under uniform ground distance, so this is the standard categorical
    t-closeness. Each probability is floored to integer micro BEFORE
    the difference (both engines truncate identically; no float fold),
    and the flag marks classes beyond t = 0.2. Scale shape: two hash
    aggregates + a |classes| × |bands| broadcast matrix (125 × ~11
    here); the customer file is scanned once."""
    c = load_table(spark, sf_dir, "customer")
    band = (cents(F.col("c_acctbal")) / 100000).cast("long")
    q = c.select("c_nationkey", "c_mktsegment", band.alias("sens_band"))
    tot = q.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    gv = q.groupBy("sens_band").agg(F.count(F.lit(1)).cast("bigint").alias("g_v"))
    cls = q.groupBy("c_nationkey", "c_mktsegment", "sens_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cv")
    )
    csz = cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_cv").cast("bigint").alias("n_c")
    )
    mat = (
        csz.crossJoin(F.broadcast(gv))
        .crossJoin(F.broadcast(tot))
        .join(
            cls,
            ["c_nationkey", "c_mktsegment", "sens_band"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_c",
            "g_v",
            "n",
            F.coalesce("n_cv", F.lit(0)).alias("n_cv"),
        )
    )
    term = F.abs(
        F.expr("(1000000 * n_cv) div n_c") - F.expr("(1000000 * g_v) div n")
    )
    tv = (F.sum(term) / 2).cast("bigint")
    return mat.groupBy("c_nationkey", "c_mktsegment").agg(
        F.min("n_c").cast("bigint").alias("group_size"),
        tv.alias("tv_distance_micro"),
        (tv > 200000).alias("above_t"),
    )


@register(
    "linkage_blocking_quality",
    oracle=f"""
    WITH {_LINK_CTES},
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM customer),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b),
    cs AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
                  CAST(sum(CASE WHEN a_key = orig_key THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_true_found
           FROM pairs)
    SELECT cs.n_cand,
           CAST(na.n_a * nb.n_b AS BIGINT) AS n_product,
           CAST((1000000 * (na.n_a * nb.n_b - cs.n_cand))
                // (na.n_a * nb.n_b) AS BIGINT) AS reduction_ratio_micro,
           CAST((1000000 * cs.n_true_found) // nb.n_b AS BIGINT)
             AS pairs_completeness_micro,
           CAST((1000000 * cs.n_true_found) // cs.n_cand AS BIGINT)
             AS pair_quality_micro
    FROM cs, na, nb
    """,
    tags=("linkage", "entity-resolution", "evaluation", "extension"),
)
def linkage_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKING-QUALITY metrics — the standard record-linkage
    evaluation triple for a candidate generator (Christen's reduction
    ratio / pairs completeness / pairs quality), here auditing the SNM
    blocking that replaced the nation-blocked join: reduction ratio =
    1 − |candidates|/|A×B| (how much of the cross product the blocking
    spares — 99.97% at sf0.1), pairs completeness = found true
    pairs / all true pairs (recall of the BLOCKING stage alone — 1.0
    on this fixture, the gate test_linkage_blocking enforces), pairs
    quality = true pairs / candidates (the blocker's precision, before
    any weight threshold). One row, all integer micro. These three
    numbers are what you compare when swapping blockers at 100 TB —
    the volume/recall tradeoff made first-class instead of buried in a
    probe log."""
    merged = _linkage_merged(spark, sf_dir).localCheckpoint(eager=True)
    pairs = _linkage_candidate_pairs(merged)
    na = merged.filter(F.col("src") == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    nb = merged.filter(F.col("src") == 1).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    cs = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.sum(F.when(F.col("a_key") == F.col("orig_key"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_found"),
    )
    return (
        cs.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_cand",
            (F.col("n_a") * F.col("n_b")).cast("bigint").alias("n_product"),
            F.expr("(1000000 * (n_a * n_b - n_cand)) div (n_a * n_b)")
            .cast("bigint")
            .alias("reduction_ratio_micro"),
            F.expr("(1000000 * n_true_found) div n_b")
            .cast("bigint")
            .alias("pairs_completeness_micro"),
            F.expr("(1000000 * n_true_found) div n_cand")
            .cast("bigint")
            .alias("pair_quality_micro"),
        )
    )


# Incremental-linkage CTE group: the clean store, the corrupted batch,
# store-derived frequency u, prefix-17 block candidates, and FS weights
# with the name-agree threshold — shared by linkage_incremental_matches
# and the golden-record maintenance oracles.
_INC_LINK_CTES = f"""
    b AS (
      SELECT c_custkey + 1000000 AS rid, c_custkey AS orig_key,
             substr(c_name, 1, length(c_name) - 1) AS name,
             CASE WHEN c_custkey % 8 = 0 THEN {sql_cents('c_acctbal')}
                  ELSE {sql_cents('c_acctbal')} + 1 END AS bal,
             c_mktsegment AS seg
      FROM customer WHERE c_custkey % 4 = 0),
    store AS (
      SELECT c_custkey AS rid, c_name AS name,
             {sql_cents('c_acctbal')} AS bal, c_mktsegment AS seg
      FROM customer),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM store),
    mname AS (SELECT CAST(sum(_n * (_n - 1)) AS BIGINT) AS mass FROM
              (SELECT count(*) AS _n FROM store GROUP BY substr(name, 1, 15)) t),
    mbal AS (SELECT CAST(sum(_n * (_n - 1)) AS BIGINT) AS mass FROM
             (SELECT count(*) AS _n FROM store GROUP BY bal) t),
    mseg AS (SELECT CAST(sum(_n * (_n - 1)) AS BIGINT) AS mass FROM
             (SELECT count(*) AS _n FROM store GROUP BY seg) t),
    u AS (SELECT
            CAST((1000000 * mname.mass) // greatest(nn.n * (nn.n - 1), 1)
              AS BIGINT) AS u_name,
            CAST((1000000 * mbal.mass) // greatest(nn.n * (nn.n - 1), 1)
              AS BIGINT) AS u_bal,
            CAST((1000000 * mseg.mass) // greatest(nn.n * (nn.n - 1), 1)
              AS BIGINT) AS u_seg
          FROM mname, mbal, mseg, nn),
    cand AS (
      SELECT s.rid AS a_key, b.rid AS b_key, b.orig_key,
             CASE WHEN substr(s.name, 1, 15) = substr(b.name, 1, 15)
                  THEN 1 ELSE 0 END AS ag_name,
             CASE WHEN s.bal = b.bal THEN 1 ELSE 0 END AS ag_bal,
             CASE WHEN s.seg = b.seg THEN 1 ELSE 0 END AS ag_seg
      FROM b JOIN store s ON substr(s.name, 1, 17) = substr(b.name, 1, 17)),
    wp AS (
      SELECT c.a_key, c.b_key, c.orig_key,
             CAST(  (CASE WHEN c.ag_name = 1
                          THEN 900000000000 // (u.u_name + 1)
                          ELSE 100000000000 // (1000001 - u.u_name) END)
                  + (CASE WHEN c.ag_bal = 1
                          THEN 900000000000 // (u.u_bal + 1)
                          ELSE 100000000000 // (1000001 - u.u_bal) END)
                  + (CASE WHEN c.ag_seg = 1
                          THEN 900000000000 // (u.u_seg + 1)
                          ELSE 100000000000 // (1000001 - u.u_seg) END)
               AS BIGINT) AS weight,
             CAST(900000000000 // (u.u_name + 1) AS BIGINT) AS thr
      FROM cand c CROSS JOIN u)"""


@register(
    "linkage_incremental_matches",
    oracle=f"""
    WITH {_INC_LINK_CTES}
    SELECT a_key, b_key, orig_key, weight FROM wp WHERE weight >= thr
    """,
    tags=("linkage", "entity-resolution", "incremental", "extension"),
)
def linkage_incremental_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL linkage decisions (operators/linkage.py) as a
    driver-visible query — the probe shape of the linkage family: the
    incoming (corrupted) records are blocked against the persisted
    clean store by a name-prefix EQUI-join (probe input = Σ |block|,
    independent of store size; the persisted path writes the store
    ``partitionBy(blk)`` and literal-prunes the probe scan to the
    batch's blocks — operators/linkage.write_clean_store /
    probe_store_candidates, scan-metrics asserted in
    tests/test_linkage_stream.py), weighted under STORE-derived
    frequency u-probabilities
    (fixed per stream — a replayed batch decides identically), and
    thresholded at the name-agreement weight. Exactly the plan each
    streaming micro-batch runs (stream==batch asserted in
    tests/test_linkage_stream.py, with full recall on the constructed
    truth: a last-char truncation never changes chars 1..17)."""
    from etl_8million_data__spark.operators.linkage import (
        prefix_block_candidates,
        store_u_micro,
        weigh_and_decide,
    )

    merged = _linkage_merged(spark, sf_dir).localCheckpoint(eager=True)
    store = merged.filter(F.col("src") == 0).select("rid", "name", "bal", "seg")
    incoming = merged.filter(F.col("src") == 1).select(
        "rid", "orig_key", "name", "bal", "seg"
    )
    u = store_u_micro(store)
    threshold = 900000000000 // (u[0] + 1)
    return weigh_and_decide(
        prefix_block_candidates(incoming, store), *u, threshold
    )


def _golden_full_sql(
    rec_a_where: str = "TRUE",
    rec_b_where: str = "TRUE",
    edge_where: str = "TRUE",
) -> str:
    """Full golden-record build as ONE DuckDB statement — the oracle
    both maintenance queries are proven against: the incremental-match
    edge set (``_INC_LINK_CTES``, optionally edge-filtered), recursive
    closure into components, and the capstone's exact survivorship.
    The maintenance paths never run this plan; equality to it is the
    correctness claim (the IVM equivalence discipline)."""
    return f"""
    WITH RECURSIVE {_INC_LINK_CTES},
    matched AS MATERIALIZED (
      SELECT a_key, b_key FROM wp WHERE weight >= thr AND ({edge_where})),
    recs AS (
      SELECT rid, CAST(NULL AS BIGINT) AS orig_key, name, bal, seg, 0 AS src
      FROM store WHERE ({rec_a_where})
      UNION ALL
      SELECT rid, orig_key, name, bal, seg, 1 AS src
      FROM b WHERE ({rec_b_where})),
    edges AS (
      SELECT a_key AS src, b_key AS dst FROM matched
      UNION ALL SELECT b_key, a_key FROM matched),
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT k.src, e.dst FROM walk k JOIN edges e ON k.dst = e.src),
    compm AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM walk GROUP BY src),
    rec AS (
      SELECT r.*, coalesce(c.component, r.rid) AS component
      FROM recs r LEFT JOIN compm c ON c.node = r.rid),
    stats AS (
      SELECT component,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(count(DISTINCT src) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT coalesce(orig_key, rid)) AS BIGINT)
               AS n_true_entities,
             max(length(name)) AS maxlen
      FROM rec GROUP BY component)
    SELECT r.component,
           s.n_members, s.n_sources, s.n_true_entities,
           min(r.name) FILTER (length(r.name) = s.maxlen) AS golden_name,
           coalesce(min(CASE WHEN r.src = 0 THEN r.bal END), min(r.bal))
             AS golden_bal,
           coalesce(min(CASE WHEN r.src = 0 THEN r.seg END), min(r.seg))
             AS golden_seg
    FROM rec r JOIN stats s USING (component)
    GROUP BY r.component, s.n_members, s.n_sources, s.n_true_entities, s.maxlen
    """


def _golden_fixture(spark: SparkSession, sf_dir: str):
    """(records, edges): the merged linkage records and their accepted
    incremental-match edges — the shared input of the golden-state
    maintenance queries."""
    from etl_8million_data__spark.operators.linkage import (
        prefix_block_candidates,
        store_u_micro,
        weigh_and_decide,
    )

    merged = _linkage_merged(spark, sf_dir).localCheckpoint(eager=True)
    store = merged.filter(F.col("src") == 0).select("rid", "name", "bal", "seg")
    incoming = merged.filter(F.col("src") == 1).select(
        "rid", "orig_key", "name", "bal", "seg"
    )
    u = store_u_micro(store)
    threshold = 900000000000 // (u[0] + 1)
    edges = (
        weigh_and_decide(prefix_block_candidates(incoming, store), *u, threshold)
        .select("a_key", "b_key")
        .localCheckpoint(eager=True)
    )
    return merged, edges


@register(
    "linkage_golden_records_increment",
    oracle=_golden_full_sql(),
    tags=(
        "linkage", "entity-resolution", "survivorship", "incremental",
        "extension", "persisted-view",
    ),
)
def linkage_golden_records_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL golden records (operators/golden.py) — the
    maintenance door the round-10 capstone lacked: the golden state is
    initialized from a PARTIAL history (every-3rd incoming record and
    its match edges held out), the held-out delta then absorbs via
    :func:`golden_increment` — touched components re-cluster with the
    delta over their OWN persisted edges, survivorship recomputes for
    those components only, untouched buckets byte-identical
    (tests/test_golden_state.py) — and the final state is read back.
    Proven by equivalence: the oracle is the FULL one-shot build over
    all records and edges (split-independence IS the correctness claim,
    the refresh_join_view discipline). Scale shape: the increment's
    only state reads are the delta rids' ridmap buckets and the touched
    components' members/edges buckets; connected components re-runs on
    the touched subgraph only; measured flat across 10x history in
    SCALING.md."""
    import shutil

    from etl_8million_data__spark.operators.golden import (
        golden_increment,
        golden_init,
        read_golden,
    )
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    records, edges = _golden_fixture(spark, sf_dir)
    is_delta = (F.col("src") == 1) & (F.col("orig_key") % 3 == 0)
    root = _persisted_index_root(sf_dir, "linkage_golden_inc")
    shutil.rmtree(root, ignore_errors=True)
    golden_init(
        spark,
        root,
        records.filter(~is_delta),
        edges.filter((F.col("b_key") - 1000000) % 3 != 0),
    )
    golden_increment(
        spark,
        root,
        records.filter(is_delta),
        edges.filter((F.col("b_key") - 1000000) % 3 == 0),
    )
    return read_golden(spark, root)


@register(
    "linkage_forget_golden",
    oracle=_golden_full_sql(
        rec_a_where="rid % 40 <> 0",
        rec_b_where="orig_key % 5 <> 0",
        edge_where="a_key % 40 <> 0 AND (b_key - 1000000) % 5 <> 0",
    ),
    tags=(
        "linkage", "entity-resolution", "survivorship", "forget", "gdpr",
        "extension", "persisted-view",
    ),
)
def linkage_forget_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR ERASE through the whole linkage chain
    (operators/golden.golden_forget) — composing the forget family's
    blast-radius discipline with entity resolution: erasing a person
    removes their member row, every match edge incident to them, and
    re-derives the golden records of exactly the components they
    belonged to — including the SPLIT case (an erased incoming record
    was the only bridge between two store records: the remaining edges
    re-cluster into separate entities) and the survivorship FALLBACK
    case (the clean source leaves, golden_bal/seg fall back to the
    corrupted copy's values). Victims here: every 40th store record +
    every 5th incoming record. Proven by equivalence: the oracle is the
    full build over the post-erase records and edges. Only the victims'
    components' buckets are read or rewritten (byte-identity and
    miss-is-no-op replay pinned in tests/test_golden_state.py); blast
    radius measured flat across 10x history in SCALING.md."""
    import shutil

    from etl_8million_data__spark.operators.golden import (
        golden_forget,
        golden_init,
        read_golden,
    )
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    records, edges = _golden_fixture(spark, sf_dir)
    root = _persisted_index_root(sf_dir, "linkage_golden_forget")
    shutil.rmtree(root, ignore_errors=True)
    golden_init(spark, root, records, edges)
    victims = records.filter(
        ((F.col("src") == 0) & (F.col("rid") % 40 == 0))
        | ((F.col("src") == 1) & (F.col("orig_key") % 5 == 0))
    ).select("rid")
    golden_forget(spark, root, victims)
    return read_golden(spark, root)


@register(
    "linkage_golden_fsck",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS n_bucket_impurity,
           CAST(0 AS BIGINT) AS n_member_ridmap_mismatch,
           CAST(0 AS BIGINT) AS n_golden_component_mismatch,
           CAST(0 AS BIGINT) AS n_edge_endpoint_escapes,
           CAST(0 AS BIGINT) AS n_label_violations
    """,
    tags=("linkage", "fsck", "consistency", "extension", "persisted-view"),
)
def linkage_golden_fsck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOLDEN-STATE CONSISTENCY GATE
    (operators/index_fsck.fsck_golden_state) as a driver-visible query:
    the state is built through the FULL maintenance lifecycle — init
    from a partial history, a delta increment, then a GDPR erase — and
    the fsck's five cross-table invariant counters (bucket purity
    across all four tables, member/ridmap component agreement,
    golden/member component-set equality, edge-endpoint containment,
    min-label convention) are returned. The oracle is the all-zeros
    row: this is deliberately an INVARIANT gate, not a computation
    check — if any maintenance path ever leaves the persisted state
    inconsistent at this scale, the driver's hash compare fails here
    even when the value-level queries still happen to answer correctly
    (planted-corruption sensitivity of the counters themselves is
    pinned in tests/test_golden_state.py). Pure column-pruned reads +
    hash aggregates; one pass over the narrow audit columns."""
    import shutil

    from etl_8million_data__spark.operators.golden import (
        golden_forget,
        golden_increment,
        golden_init,
    )
    from etl_8million_data__spark.operators.index_fsck import fsck_golden_state
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    records, edges = _golden_fixture(spark, sf_dir)
    is_delta = (F.col("src") == 1) & (F.col("orig_key") % 3 == 0)
    root = _persisted_index_root(sf_dir, "linkage_golden_fsck")
    shutil.rmtree(root, ignore_errors=True)
    golden_init(
        spark,
        root,
        records.filter(~is_delta),
        edges.filter((F.col("b_key") - 1000000) % 3 != 0),
    )
    golden_increment(
        spark,
        root,
        records.filter(is_delta),
        edges.filter((F.col("b_key") - 1000000) % 3 == 0),
    )
    golden_forget(
        spark,
        root,
        records.filter(
            (F.col("src") == 1) & (F.col("orig_key") % 16 == 8)
        ).select("rid"),
    )
    return fsck_golden_state(spark, root)


def _em_iter_sql(prev: str, cur: str) -> str:
    """One unrolled EM iteration over the 8-row agreement-pattern table
    for the oracle: E-step responsibilities g in integer micro (three
    scaled multiplies, truncating — intermediates stay <= 1e12), M-step
    weighted counts. MATERIALIZED so DuckDB cannot inline the chain
    exponentially (the kcore lesson)."""

    def chain(p0: str, t1: str, t2: str, t3: str) -> str:
        return (
            f"(((({p0}) * ({t1})) // 1000000 * ({t2})) // 1000000"
            f" * ({t3})) // 1000000"
        )

    def term(flag: str, prob: str) -> str:
        return f"CASE WHEN {flag} = 1 THEN {prob} ELSE 1000000 - {prob} END"

    num = chain(
        f"{prev}.p",
        term("pat.ag_name", f"{prev}.mn"),
        term("pat.ag_bal", f"{prev}.mb"),
        term("pat.ag_seg", f"{prev}.ms"),
    )
    den = chain(
        f"1000000 - {prev}.p",
        term("pat.ag_name", f"{prev}.un"),
        term("pat.ag_bal", f"{prev}.ub"),
        term("pat.ag_seg", f"{prev}.us"),
    )
    return f"""
    {cur}g AS MATERIALIZED (
      SELECT pat.ag_name, pat.ag_bal, pat.ag_seg, pat.n_pat,
             CAST((1000000 * ({num}))
                  // greatest(({num}) + ({den}), 1) AS BIGINT) AS g
      FROM pat CROSS JOIN {prev}),
    {cur} AS MATERIALIZED (
      SELECT
        CAST(sum(n_pat * g) // sum(n_pat) AS BIGINT) AS p,
        CAST((1000000 * sum(n_pat * g * ag_name))
             // greatest(sum(n_pat * g), 1) AS BIGINT) AS mn,
        CAST((1000000 * sum(n_pat * g * ag_bal))
             // greatest(sum(n_pat * g), 1) AS BIGINT) AS mb,
        CAST((1000000 * sum(n_pat * g * ag_seg))
             // greatest(sum(n_pat * g), 1) AS BIGINT) AS ms,
        CAST((1000000 * sum(n_pat * (1000000 - g) * ag_name))
             // greatest(sum(n_pat * (1000000 - g)), 1) AS BIGINT) AS un,
        CAST((1000000 * sum(n_pat * (1000000 - g) * ag_bal))
             // greatest(sum(n_pat * (1000000 - g)), 1) AS BIGINT) AS ub,
        CAST((1000000 * sum(n_pat * (1000000 - g) * ag_seg))
             // greatest(sum(n_pat * (1000000 - g)), 1) AS BIGINT) AS us
      FROM {cur}g)"""


_EM_ROUNDS = 5
_EM_CHAIN = ",".join(
    _em_iter_sql(f"em{i}" if i else "em0", f"em{i + 1}")
    for i in range(_EM_ROUNDS)
)


@register(
    "linkage_em_parameters",
    oracle=f"""
    WITH {_LINK_CTES},
    pat AS MATERIALIZED (
      SELECT ag_name, ag_bal, ag_seg, CAST(count(*) AS BIGINT) AS n_pat
      FROM pairs GROUP BY 1, 2, 3),
    em0 AS (SELECT CAST(100000 AS BIGINT) AS p,
                   CAST(900000 AS BIGINT) AS mn,
                   CAST(900000 AS BIGINT) AS mb,
                   CAST(900000 AS BIGINT) AS ms,
                   u.u_name AS un,
                   u.u_bal AS ub,
                   u.u_seg AS us
            FROM u),
    {_EM_CHAIN}
    SELECT p AS p_match_micro,
           mn AS m_name_micro, mb AS m_bal_micro, ms AS m_seg_micro,
           un AS u_name_micro, ub AS u_bal_micro, us AS u_seg_micro
    FROM em{_EM_ROUNDS}
    """,
    tags=("linkage", "entity-resolution", "em", "extension"),
)
def linkage_em_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM ESTIMATION of the Fellegi–Sunter parameters — the unsupervised
    estimator the classic record-linkage literature actually prescribes
    (Winkler's EM for the conditional-independence model), replacing the
    assumed m = 0.9 the weight queries declare: from the 8-row
    agreement-pattern counts alone (NO ground truth), 5 unrolled EM
    rounds learn p (match prevalence), per-field m (P(agree|match)) and
    u (P(agree|non-match)). E-step responsibilities and M-step updates
    are integer-micro fixed point — three scaled truncating multiplies
    keep every intermediate <= 1e12, both engines share the exact
    expression tree, so the learned parameters HASH-MATCH (the PCA
    unrolled-chain discipline).

    IDENTIFIABILITY HARDENING (round 11): with the naive symmetric
    init (u=0.1 per field) EM found a latent two-class structure whose
    "match" class was ~3x the true match set (measured p=0.13 vs true
    0.039; m_bal=0.15 vs true 0.50) — under SNM blocking nearly every
    candidate agrees on the name prefix, so the mixture drifted toward
    the segment-agreement cluster: the textbook identifiability caveat
    of unsupervised EM on few binary fields. The standard guard
    (Winkler/Jaro practice) is to initialize u at the FREQUENCY-BASED
    chance-agreement estimate — already computed blocking-independently
    by :func:`_linkage_u_frame` — which anchors the non-match class at
    the population agreement rates. Measured recovery at sf0.01:
    p=0.037 (true 0.039), m_bal=0.53 (true 0.50), m_name=1.0,
    m_seg=1.0. The label-switching direction is PINNED by a driver-side
    assertion after training: m_f >= u_f for every field and strictly
    greater for at least one (a violation raises instead of silently
    returning swapped classes); a recovered-parameter tolerance gate
    against the fixture's constructed corruption rates lives in
    tests/test_linkage_em.py.

    Scale shape: ONE pass builds the pattern table (the SNM-blocked
    candidate aggregate); every EM round is arithmetic over 8 rows
    crossed with a 1-row parameter frame — constant-time however large
    the files are. Oracle: the identical unrolled chain as MATERIALIZED
    CTEs."""
    merged = _linkage_merged(spark, sf_dir)
    pairs = _linkage_candidate_pairs(merged)
    pat = (
        pairs.groupBy("ag_name", "ag_bal", "ag_seg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pat"))
        .localCheckpoint(eager=True)
    )
    # init: assumed m = 0.9; u = the frequency-based chance-agreement
    # estimate (blocking-independent) — the identifiability anchor
    params = _linkage_u_frame(merged).select(
        F.lit(100000).cast("bigint").alias("p"),
        F.lit(900000).cast("bigint").alias("mn"),
        F.lit(900000).cast("bigint").alias("mb"),
        F.lit(900000).cast("bigint").alias("ms"),
        F.col("u_name").alias("un"),
        F.col("u_bal").alias("ub"),
        F.col("u_seg").alias("us"),
    )

    # INTEGER div expressions shared verbatim with the oracle: float
    # floor-division would silently lose ulps past 2^53 (the M-step's
    # 1e17 numerators), so every step is Spark SQL `div` on bigints —
    # truncation semantics identical to DuckDB's integer `//`.
    def term(flag: str, prob: str) -> str:
        return f"CASE WHEN {flag} = 1 THEN {prob} ELSE 1000000 - {prob} END"

    def chain(p0: str, t1: str, t2: str, t3: str) -> str:
        return (
            f"(((({p0}) * ({t1})) div 1000000 * ({t2})) div 1000000"
            f" * ({t3})) div 1000000"
        )

    num = chain(
        "p", term("ag_name", "mn"), term("ag_bal", "mb"), term("ag_seg", "ms")
    )
    den = chain(
        "1000000 - p",
        term("ag_name", "un"),
        term("ag_bal", "ub"),
        term("ag_seg", "us"),
    )
    g_expr = (
        f"CAST((1000000 * ({num})) div greatest(({num}) + ({den}), 1)"
        " AS BIGINT)"
    )

    def mstep(flag: str, w: str) -> str:
        return (
            f"CAST((1000000 * sum(n_pat * ({w}) * {flag}))"
            f" div greatest(sum(n_pat * ({w})), 1) AS BIGINT)"
        )

    for _ in range(_EM_ROUNDS):
        gf = pat.crossJoin(F.broadcast(params)).selectExpr(
            "ag_name", "ag_bal", "ag_seg", "n_pat", f"{g_expr} AS g"
        )
        params = gf.agg(
            F.expr("CAST(sum(n_pat * g) div sum(n_pat) AS BIGINT)").alias("p"),
            F.expr(mstep("ag_name", "g")).alias("mn"),
            F.expr(mstep("ag_bal", "g")).alias("mb"),
            F.expr(mstep("ag_seg", "g")).alias("ms"),
            F.expr(mstep("ag_name", "1000000 - g")).alias("un"),
            F.expr(mstep("ag_bal", "1000000 - g")).alias("ub"),
            F.expr(mstep("ag_seg", "1000000 - g")).alias("us"),
        ).localCheckpoint(eager=True)
    # label-switching guard: the "match" class must agree MORE than the
    # non-match class on every field, strictly on at least one — a
    # swapped or collapsed mixture must fail loudly, never return
    # plausible-looking swapped parameters (1-row frame: bounded read)
    learned = params.first()
    pins = [
        (learned["mn"], learned["un"], "name"),
        (learned["mb"], learned["ub"], "bal"),
        (learned["ms"], learned["us"], "seg"),
    ]
    if not all(m >= u for m, u, _ in pins) or not any(m > u for m, u, _ in pins):
        raise RuntimeError(
            "EM label direction lost (m < u or m == u on every field): "
            + ", ".join(f"{f}: m={m} u={u}" for m, u, f in pins)
        )
    return params.select(
        F.col("p").alias("p_match_micro"),
        F.col("mn").alias("m_name_micro"),
        F.col("mb").alias("m_bal_micro"),
        F.col("ms").alias("m_seg_micro"),
        F.col("un").alias("u_name_micro"),
        F.col("ub").alias("u_bal_micro"),
        F.col("us").alias("u_seg_micro"),
    )


@register(
    "cohort_survival_curve",
    oracle="""
    WITH weeks AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    horizon AS (SELECT max(wk) AS max_wk FROM weeks),
    users AS (
      SELECT user_id, min(wk) AS cohort_week,
             CAST((max(wk) - min(wk)) / 7 AS BIGINT) AS last_offset
      FROM weeks GROUP BY user_id),
    ks AS (SELECT CAST(u.i AS BIGINT) AS k
           FROM horizon h, weeks w,
                unnest(range(1 + CAST((h.max_wk
                  - (SELECT min(wk) FROM weeks)) / 7 AS BIGINT))) AS u(i)
           GROUP BY 1),
    cells AS (
      SELECT u.cohort_week, k.k,
             CAST(count(*) AS BIGINT) AS n_at_risk,
             CAST(sum(CASE WHEN u.last_offset >= k.k THEN 1 ELSE 0 END)
               AS BIGINT) AS n_active
      FROM users u
      CROSS JOIN horizon h
      JOIN ks k ON k.k <= CAST((h.max_wk - u.cohort_week) / 7 AS BIGINT)
      GROUP BY 1, 2)
    SELECT cohort_week, k, n_at_risk, n_active,
           CAST((1000000 * n_active) // n_at_risk AS BIGINT) AS survival_micro
    FROM cells
    """,
    tags=("behavioral", "retention", "survival", "extension"),
)
def cohort_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CENSORING-AWARE retention (survival) curve — the fix for the
    classic retention-table lie: a young cohort has not EXISTED long
    enough to be active at large offsets, so dividing by cohort size
    understates its survival. Per (cohort week, offset k): n_at_risk
    counts only users whose OBSERVATION HORIZON reaches k (cohort_week
    + k·7d <= the dataset's last active week — right-censoring), and
    survival = still-active users (last activity offset >= k) over
    those at risk, in integer micro. Offsets where a cohort is entirely
    censored produce NO row instead of a misleading zero.

    Scale shape: one user-level aggregate (first/last week), a
    broadcast 1-row horizon, and an offset spine bounded by the span in
    weeks — the at-risk join fans out |users| × |their horizon| rows,
    all integer arithmetic; no data-sized windows."""
    e = load_table(spark, sf_dir, "events")
    weeks = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    horizon = weeks.agg(F.max("wk").alias("max_wk"), F.min("wk").alias("min_wk"))
    users = weeks.groupBy("user_id").agg(
        F.min("wk").alias("cohort_week"),
        F.floor(F.datediff(F.max("wk"), F.min("wk")) / 7)
        .cast("bigint")
        .alias("last_offset"),
    )
    ks = (
        horizon.select(
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.datediff("max_wk", "min_wk") / 7).cast("bigint"),
                )
            ).alias("k")
        )
    )
    cells = (
        users.crossJoin(F.broadcast(horizon))
        .join(
            F.broadcast(ks),
            F.col("k")
            <= F.floor(F.datediff("max_wk", "cohort_week") / 7).cast("bigint"),
        )
        .groupBy("cohort_week", "k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_at_risk"),
            F.sum(F.when(F.col("last_offset") >= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_active"),
        )
    )
    return cells.select(
        "cohort_week",
        "k",
        "n_at_risk",
        "n_active",
        F.expr("(1000000 * n_active) div n_at_risk")
        .cast("bigint")
        .alias("survival_micro"),
    )
