"""Join-strategy advisor (operators/partitioning.advise_join): the
coordinated bottom-k cardinality sketch feeds a broadcast-vs-shuffle
decision, thresholds are the MEASURED ones (ivm's 200-key literal-IN
bound; ~10 MB broadcast), and the advised strategy must actually appear
in the executed plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.partitioning import (
    ADVISE_LITERAL_KEYS,
    advise_join,
    apply_advice,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_advice_thresholds_and_estimate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    # nation side: 25 distinct keys <= 200 -> literal
    cust_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey"), "c_custkey"
    )
    adv = advise_join(cust_n, n, "n_nationkey")
    assert adv["strategy"] == "literal" and adv["small_side"] == "b"
    assert adv["d_b"] <= ADVISE_LITERAL_KEYS

    # orders side vs lineitem: > 200 keys, fits broadcast at fixture scale
    li2 = li.select(F.col("l_orderkey").alias("key"), "l_quantity")
    o2 = o.select(F.col("o_orderkey").alias("key"), "o_custkey")
    adv2 = advise_join(li2, o2, "key")
    assert adv2["strategy"] == "broadcast" and adv2["small_side"] == "b"
    # estimate quality: the sketch's measured 2.7-7.6% error band, with slack
    actual = li2.join(o2, "key").count()
    assert actual > 0
    assert abs(adv2["est_join_rows"] - actual) <= 0.15 * actual, (
        adv2["est_join_rows"],
        actual,
    )

    # forcing a tiny broadcast budget must demote to shuffle
    adv3 = advise_join(li2, o2, "key", broadcast_rows=10)
    assert adv3["strategy"] == "shuffle"

    # the advised strategy lands in the executed plan, result identical
    j_lit = apply_advice(cust_n, n, "n_nationkey", adv)
    p_lit = _plan(j_lit)
    assert "BroadcastHashJoin" in p_lit
    # the literal key set is pushed at the big side's scan
    assert "n_nationkey" in p_lit and ("In(" in p_lit or "IN (" in p_lit or "in(" in p_lit.lower())
    assert j_lit.count() == cust_n.join(n, "n_nationkey").count()

    j_b = apply_advice(li2, o2, "key", adv2)
    assert "BroadcastHashJoin" in _plan(j_b)
    assert j_b.count() == actual

    # 'shuffle' means UNHINTED — the fixture-scale planner may still
    # broadcast under its own 10 MB threshold (and at 100 TB it won't):
    # assert the hint's presence/absence at the logical layer instead
    j_s = apply_advice(li2, o2, "key", adv3)
    assert "ResolvedHint" not in j_s._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in j_b._jdf.queryExecution().analyzed().toString()
    assert j_s.count() == actual


def test_skew_aware_advice_salts_the_hot_key(spark, sf_dir):
    """Planted-skew fixture: folding a third of lineitem's order keys
    onto ONE hot key makes the shuffled join's key distribution
    pathological (max/p50 in the thousands); the advisor must (a)
    measure it (skew_max_n / skew_p50 reported), (b) escalate the
    'shuffle' pick to 'salted', and (c) execute the salted two-phase
    join with a result identical to the plain join. A uniform keyspace
    under the same forced-shuffle budget must NOT salt."""
    from etl_8million_data__spark.operators.partitioning import (
        ADVISE_SKEW_RATIO,
        ADVISE_SKEW_SHARE,
    )

    li = load_table(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("key"),
        "l_quantity",
    )
    small = big.select("key").distinct().withColumn("flag", F.col("key") % 7)

    # force both sides past the broadcast budget so the base pick is
    # shuffle; the skew gate must then escalate
    adv = advise_join(big, small, "key", broadcast_rows=10)
    assert adv["strategy"] == "salted", adv
    assert adv["skew_max_n"] >= ADVISE_SKEW_RATIO * adv["skew_p50"]
    assert adv["skew_max_n"] * ADVISE_SKEW_SHARE >= max(adv["n_a"], adv["n_b"])

    j = apply_advice(big, small, "key", adv)
    # the executed plan really goes through the salt: the join key set
    # includes the salt column and the small side carries the explode
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    want = big.join(small, "key")
    assert j.count() == want.count()
    got_agg = {
        (r["flag"], r["cnt"])
        for r in j.groupBy("flag").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    want_agg = {
        (r["flag"], r["cnt"])
        for r in want.groupBy("flag").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_agg == want_agg

    # uniform keyspace: same forced-shuffle budget, no hot key -> stays
    # an unhinted shuffle and still reports the measured distribution
    uni = li.select(F.col("l_orderkey").alias("key"), "l_quantity")
    adv_u = advise_join(uni, small, "key", broadcast_rows=10)
    assert adv_u["strategy"] == "shuffle", adv_u
    assert "skew_max_n" in adv_u and "skew_p50" in adv_u


def test_composite_key_skew_salts_and_executes(spark, sf_dir):
    """A hot key under a COMPOSITE join key escalates to 'salted' like
    the single-key case (the salt spreads rows, independent of key
    arity), and apply_advice executes the advice with a result
    identical to the plain join — composite keys through the salt path
    end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k1"),
        (F.col("l_orderkey") % 2).alias("k2"),
        "l_quantity",
    )
    small = big.select("k1", "k2").distinct().withColumn("flag", F.col("k1") % 7)

    adv = advise_join(big, small, ["k1", "k2"], broadcast_rows=10)
    assert adv["skew_max_n"] >= 2 * adv["skew_p50"], adv
    assert adv["strategy"] == "salted", adv
    j = apply_advice(big, small, ["k1", "k2"], adv)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    want = big.join(small, ["k1", "k2"])
    assert j.count() == want.count()
    got_agg = {
        (r["flag"], r["cnt"])
        for r in j.groupBy("flag").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    want_agg = {
        (r["flag"], r["cnt"])
        for r in want.groupBy("flag").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_agg == want_agg
