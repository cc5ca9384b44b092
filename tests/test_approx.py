"""Approximate aggregates stay within their error bounds of the exact
forms — both through the registered self-certifying queries (whose
`*_ok` / `*_within_bound` assertions the DuckDB oracle expects true)
and directly against the raw sketch values."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.plans import all_queries


def test_hll_within_rsd(spark, sf_dir):
    rows = all_queries()["approx_distinct_users_hll"].build(spark, sf_dir).collect()
    assert rows and all(r.hll_within_bound for r in rows)
    # the exact side the query carries matches an independent recompute
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type: r.exact_users for r in rows} == exact
    # raw sketch accuracy, independent of the query's bound column
    appx = {
        r.event_type: r.a
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(appx[et] - n) / n <= 0.1, (et, appx[et], n)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    r = all_queries()["approx_percentile_prices"].build(spark, sf_dir).collect()[0]
    assert r.p50_ok and r.p90_ok and r.p99_ok
    o = load_table(spark, sf_dir, "orders")
    assert r.n_orders == o.count()
    # raw sketch accuracy: GK with accuracy 10000 on a few-thousand-row
    # table is near-exact; allow a loose 2% envelope on p50
    pcts = o.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("p")
    ).collect()[0].p
    exact = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("p50")).collect()[0].p50
    assert abs(pcts[0] - exact) / exact < 0.02
    assert pcts[0] <= pcts[1] <= pcts[2]


def test_hll_sharded_union_close_to_single_pass(spark):
    """Unioning per-shard sketches must track a single-pass sketch
    regardless of how the data was sharded — the property that lets
    100-TB pipelines store per-partition sketches and never rescan.
    NOT bit-equality: Datasketches sketches start sparse and the union
    path promotes representations differently than a single-pass build
    (observed 1488 vs 1494 on 1500 exact at sf0.1), so the contract is
    closeness within the sketch's error envelope."""
    from etl_8million_data__spark.catalog import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        e = load_table(spark, sf, "events")
        exact = e.agg(F.count_distinct("user_id").alias("x")).collect()[0].x
        direct = e.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
        ).collect()[0].est

        for shard_key in ("event_type", F.col("event_id") % 7):
            merged = (
                e.groupBy(shard_key)
                .agg(F.hll_sketch_agg("user_id").alias("sk"))
                .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
                .collect()[0]
                .est
            )
            assert abs(merged - direct) <= exact * 0.02 + 5, (sf, merged, direct)

        row = __import__(
            "etl_8million_data__spark.plans", fromlist=["all_queries"]
        ).all_queries()["sketch_hll_sharded_union"].build(spark, sf).collect()[0]
        assert row.merge_consistent and row.within_bound, sf


def test_bloom_audit_exercises_false_positive_arm(spark):
    """At sf0.01 the 8192-bit filter over URGENT-order custkeys must
    report real false positives (non-members exist AND the fill factor
    produces collisions) and zero false negatives — the audit's FP arm
    is live, not dead code under an oversized table."""
    df = all_queries()["sketch_bloom_membership"].build(spark, "/root/testdata/sf0.01")
    agg = df.agg(
        F.sum("n_false_pos").alias("fp"),
        F.sum("n_false_neg").alias("fn"),
        F.sum("n_actual").alias("members"),
        F.sum("n_customers").alias("total"),
    ).collect()[0]
    assert agg.fn == 0
    assert agg.fp > 0, "FP arm dead again — filter oversized for fixture keys"
    assert agg.members < agg.total, "no non-members: audit population degenerate"


def test_bloom_pruned_antijoin_matches_plain_antijoin(spark, sf_dir):
    """The pruned plan must be the IDENTITY of the plain anti-join —
    false positives cost work, never rows — and the pruned branch must
    actually carry rows (definitely-absent customers bypass the join)."""
    pruned = (
        all_queries()["sketch_bloom_pruned_antijoin"].build(spark, sf_dir).collect()
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    plain = (
        cust.select("c_custkey", "c_name", "c_mktsegment")
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .collect()
    )
    assert sorted(r.c_custkey for r in pruned) == sorted(r.c_custkey for r in plain)
    assert len(pruned) > 0


def test_kmv_type_overlap_accuracy(spark):
    """Theta-intersection estimates: exact by construction while the
    sketches are under capacity (sf0.001: every |set| < k), and within
    15% relative error once at capacity (sf0.01 measured ~3.4%)."""
    qs = all_queries()
    under = qs["sketch_kmv_type_overlap"].build(spark, "/root/testdata/sf0.001").collect()
    for r in under:
        assert r.est_micro == r.exact_overlap * 1_000_000, (r.type_a, r.type_b)
    at_cap = qs["sketch_kmv_type_overlap"].build(spark, "/root/testdata/sf0.01").collect()
    assert at_cap
    for r in at_cap:
        est = r.est_micro / 1e6
        assert abs(est - r.exact_overlap) <= 0.15 * r.exact_overlap + 2, (
            r.type_a, r.type_b, est, r.exact_overlap,
        )


def test_kmv_customer_churn_accuracy(spark):
    """Theta A-not-B error scales with |A|/sqrt(k), NOT with the
    difference size (the classic caveat of sketch set-difference): with
    k=64 the 99% envelope is ~2.6/sqrt(64) = 0.33 of |A|. Measured
    max |err|/|A|: 0.12 (sf0.001), 0.25 (sf0.01); means 0.04/0.07 —
    gated per-row at the theoretical envelope and in aggregate just
    above measured. Every fixture pair has a NONZERO exact difference
    (year segments churn by construction), so the audit is never the
    degenerate all-zeros check."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table

    qs = all_queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        o = load_table(spark, sf, "orders")
        sizes = {
            r.y: r.n
            for r in o.select(F.year("o_orderdate").alias("y"), "o_custkey")
            .distinct()
            .groupBy("y")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rows = qs["sketch_kmv_customer_churn"].build(spark, sf).collect()
        assert len(rows) == 42  # 7 years, ordered pairs
        assert all(r.exact_diff > 0 for r in rows), "audit must not be degenerate"
        ratios = [
            abs(r.est_micro / 1e6 - r.exact_diff) / sizes[r.year_a] for r in rows
        ]
        assert max(ratios) <= 0.33, (sf, max(ratios))
        assert sum(ratios) / len(ratios) <= 0.10, (sf, sum(ratios) / len(ratios))


def test_bottomk_quantile_sketch_error_and_mergeability(spark, sf_dir):
    """The bottom-k quantile sketch's own error audit must be in the
    sampling-theory range (k=256 -> quantile rank error ~ O(1/sqrt(k))
    ~ 6%; measured rel err 0.2-11% across q), and the sketch must be
    MERGEABLE: the bottom-k of a union equals the re-truncated union of
    the halves' bottom-ks — the property that lets per-shard sketches
    combine without touching rows again."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.text import md5_utf8
    from etl_8million_data__spark.plans import all_queries

    rows = all_queries()["sketch_bottomk_quantiles"].build(spark, sf_dir).collect()
    assert [r.q_pct for r in rows] == [25, 50, 90, 95, 99]
    # tail quantiles are where a 256-sample is strongest on a smooth
    # distribution; gate loosely above measured (max seen 11.2%)
    assert all(r.rel_err_micro <= 200_000 for r in rows), [
        (r.q_pct, r.rel_err_micro) for r in rows
    ]

    # mergeability: bottom-k(A ∪ B) == truncate(bottom-k(A) ∪ bottom-k(B))
    k = 256
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", md5_utf8(F.col("o_orderkey").cast("string")).alias("h")
    )
    whole = [r.h for r in o.orderBy("h").limit(k).collect()]
    ha = o.filter(F.col("o_orderkey") % 2 == 0).orderBy("h").limit(k)
    hb = o.filter(F.col("o_orderkey") % 2 == 1).orderBy("h").limit(k)
    merged = [r.h for r in ha.unionAll(hb).orderBy("h").limit(k).collect()]
    assert merged == whole


def test_weighted_sample_skews_toward_heavy_docs_and_merges(spark, sf_dir):
    """The replicated-ticket weighted sample must actually skew toward
    high-weight documents (selected mean weight > corpus mean weight —
    non-vacuous on the fixtures, whose n_chars vary), and the bottom-k
    key set must merge: bottom-100 of the whole == re-truncated union
    of the halves' bottom-100s."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.plans import all_queries

    q = all_queries()["corpus_weighted_sample_tickets"]
    sel = q.build(spark, sf_dir)
    rows = sel.collect()
    assert len(rows) == 100
    assert [r.draw for r in rows] == sorted(r.draw for r in rows)

    from etl_8million_data__spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    corpus_mean_w = (
        d.select(
            F.least(1 + F.expr("n_chars div 200"), F.lit(8)).alias("w")
        ).agg(F.avg("w")).first()[0]
    )
    sel_mean_w = sum(r.weight for r in rows) / len(rows)
    assert sel_mean_w > corpus_mean_w, (sel_mean_w, corpus_mean_w)

    # mergeability on the (min_ticket, doc_id) key order: per-half
    # bottom-100s recomputed from scratch (the real shard-merge path)
    whole = [(r.min_ticket, r.doc_id) for r in rows]
    from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8

    w = d.select(
        "doc_id",
        F.least(1 + F.expr("n_chars div 200"), F.lit(8)).cast("bigint").alias("weight"),
    )
    t = w.select(
        "doc_id", "weight",
        F.explode(F.sequence(F.lit(0), F.col("weight") - 1)).alias("i"),
    )
    h = hex_prefix_int(
        md5_utf8(F.concat(F.col("doc_id").cast("string"), F.lit("#t#"), F.col("i").cast("string"))), 8
    )
    k = (
        t.select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("mt"))
    )
    merged = (
        k.filter(F.col("doc_id") % 2 == 0).orderBy("mt", "doc_id").limit(100)
        .unionAll(k.filter(F.col("doc_id") % 2 == 1).orderBy("mt", "doc_id").limit(100))
        .orderBy("mt", "doc_id").limit(100)
    )
    got = [(r.mt, r.doc_id) for r in merged.collect()]
    assert got == whole


def test_grouped_quantile_sketch_covers_groups_with_bounded_error(spark, sf_dir):
    from etl_8million_data__spark.plans import all_queries

    rows = all_queries()["sketch_bottomk_quantiles_by_group"].build(
        spark, sf_dir
    ).collect()
    groups = {r.grp for r in rows}
    assert len(groups) == 5  # all order priorities audited
    assert all(r.rel_err_micro <= 250_000 for r in rows), [
        (r.grp, r.q_pct, r.rel_err_micro) for r in rows
    ]


def test_join_cardinality_sketch_error_bounded(spark, sf_dir):
    """The coordinated bottom-k join-size estimate must land within
    sampling-theory range of the actual (k=256 -> ~1/sqrt(k) ~ 6%
    relative error; measured 2.7-7.6% across scales, gated 15%), and
    its sample must be full (k_used == 256 on fixtures with > 256
    join keys) so the scaled path — not the exact-small-domain branch —
    is what's being audited."""
    from etl_8million_data__spark.plans import all_queries

    r = all_queries()["sketch_join_cardinality"].build(spark, sf_dir).first()
    assert r.k_used == 256, "domain fell below k: the scaled path is untested"
    assert r.actual_rows > 0
    assert r.rel_err_micro <= 150_000, (r.est_rows, r.actual_rows, r.rel_err_micro)


def test_stream_quantile_sketch_equals_batch_bottomk(spark, sf_dir, tmp_path):
    """Streaming the orders through the sketch maintainer (one file per
    micro-batch) must leave EXACTLY the batch-computed bottom-256
    sample — mergeability in its production form — and a full replay
    under a fresh checkpoint must leave it unchanged."""
    import os

    from pyspark.sql import functions as F

    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8
    from etl_8million_data__spark.streaming.jobs import (
        stream_quantile_sketch_increment,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # stage as 4 files -> 4 micro-batches with maxFilesPerTrigger=1
    src = str(tmp_path / "src")
    o.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sk = str(tmp_path / "sketch")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_quantile_sketch_increment(
            stream, sk, str(tmp_path / ckpt)
        ).awaitTermination()

    run("c1")
    got = sorted(
        (r.h, r.key, r.v) for r in spark.read.parquet(sk).collect()
    )
    want = sorted(
        (r.h, r.key, r.v)
        for r in o.select(
            "key",
            F.col("cents").alias("v"),
            hex_prefix_int(md5_utf8(F.col("key").cast("string")), 8).alias("h"),
        )
        .orderBy("h", "key")
        .limit(256)
        .collect()
    )
    assert got == want and len(got) == 256
    run("c2")  # replay: same rows re-merge to the same sample
    assert sorted(
        (r.h, r.key, r.v) for r in spark.read.parquet(sk).collect()
    ) == want


def test_stream_quantile_sketch_rearrival_is_deterministic(spark, tmp_path):
    """A key re-arriving with a DIFFERENT value must resolve
    deterministically (min per key under the total order), and a
    non-bigint key type must round-trip unchanged through the persisted
    sketch (the empty-sketch schema derives from the batch, not a
    hardcoded 'key long')."""
    from etl_8million_data__spark.streaming.jobs import (
        stream_quantile_sketch_increment,
    )

    src = str(tmp_path / "src")
    # string keys; key 'a' arrives twice with different values
    spark.createDataFrame(
        [("a", 50), ("b", 20)], "k string, cents long"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("a", 10), ("c", 30)], "k string, cents long"
    ).coalesce(1).write.mode("append").parquet(src)
    sk = str(tmp_path / "sketch")
    schema = spark.read.parquet(src).schema

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_quantile_sketch_increment(
            stream, sk, str(tmp_path / ckpt), k=16, key_col="k", value_col="cents"
        ).awaitTermination()

    run("c1")
    got = {r.key: r.v for r in spark.read.parquet(sk).collect()}
    assert got == {"a": 10, "b": 20, "c": 30}  # min(v) per key, key type kept
    assert dict(spark.read.parquet(sk).dtypes)["key"] == "string"
    run("c2")  # replay resolves identically
    assert {r.key: r.v for r in spark.read.parquet(sk).collect()} == got
