"""Sampled range-boundary chooser (operators/partitioning): the
deterministic 10% sample's split points must partition the FULL table
into near-equal-frequency ranges — the property a range-partitioned
sort/shuffle layout actually needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents
from etl_8million_data__spark.operators.partitioning import (
    portable_hash_permille,
    sampled_range_bounds,
)

SF = "/root/testdata/sf0.01"


def test_bounds_split_full_table_near_equally(spark):
    o = load_table(spark, SF, "orders")
    n_buckets = 8
    bounds = sampled_range_bounds(
        o, cents("o_totalprice"), "o_orderkey", n_buckets=n_buckets
    ).collect()
    assert len(bounds) == n_buckets - 1
    cuts = sorted(r.bound_value for r in bounds)
    assert cuts == [r.bound_value for r in sorted(bounds, key=lambda r: r.bound_no)]

    # bucket the FULL table by the sampled cuts; each bucket should get
    # ~1/8 of the rows (10% sample => a few % relative error)
    expr = F.lit(0)
    for c in cuts:
        expr = expr + F.when(cents("o_totalprice") > c, 1).otherwise(0)
    sizes = [
        r.n
        for r in o.groupBy(expr.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    total = sum(sizes)
    assert len(sizes) == n_buckets
    for s in sizes:
        assert abs(s - total / n_buckets) / (total / n_buckets) < 0.25, sizes


def test_sample_is_deterministic(spark):
    o = load_table(spark, SF, "orders")
    a = o.filter(portable_hash_permille(F.col("o_orderkey")) < 100).count()
    b = o.filter(portable_hash_permille(F.col("o_orderkey")) < 100).count()
    assert a == b
    # ~10% of the table, not wildly off (hash uniformity)
    n = o.count()
    assert 0.07 * n < a < 0.13 * n


def test_lm_fluency_train_docs_have_no_novel_bigrams(spark):
    """Every train-sample doc contributed its own bigrams to the model,
    so its novel_bigrams must be exactly 0; out-of-sample docs in the
    synthetic fixture should show some novelty. Scores are valid
    probabilities."""
    from etl_8million_data__spark.plans import all_queries

    scores = all_queries()["corpus_lm_fluency_scores"].build(spark, SF)
    docs = load_table(spark, SF, "documents").select("doc_id")
    j = scores.join(docs, "doc_id").withColumn(
        "in_train", portable_hash_permille(F.col("doc_id")) < 100
    )
    rows = j.collect()
    assert rows
    for r in rows:
        assert 0.0 < r.mean_prob <= 1.0
        if r.in_train:
            assert r.novel_bigrams == 0, r
    out = [r for r in rows if not r.in_train]
    assert out and sum(r.novel_bigrams for r in out) > 0


def test_global_ntile_matches_spark_ntile(spark):
    """global_ntile (boundary-table form) must equal ntile() OVER a
    global order exactly — sizes with every n%k residue, heavy ties
    spanning bucket boundaries, single-row buckets, asc and desc."""
    import pyspark.sql.functions as SF
    from pyspark.sql import Window as W

    from etl_8million_data__spark.operators.partitioning import global_ntile
    rng_vals = [0, 1, 5, 5, 5, 7, 12, 12, 13, 25, 25, 25, 25, 40, 99]

    def check(case):
        n, k, desc = case
        rows = [(i, rng_vals[i % len(rng_vals)]) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        order = SF.col("v").desc() if desc else SF.col("v").asc()
        expected = {
            (r.id): r.t
            for r in df.select(
                "id", SF.ntile(k).over(W.orderBy(order, "id")).alias("t")
            ).collect()
        }
        got = {
            r.id: r.tile
            for r in global_ntile(
                df, k, "v", "id",
                SF.floor(SF.col("v") / 10).cast("bigint"),
                descending=desc,
            ).collect()
        }
        assert got == expected, (n, k, desc, got, expected)

    # 54 independent tiny cases: run them through the session's
    # thread-safe job submission instead of serially (37s -> ~7s)
    from concurrent.futures import ThreadPoolExecutor

    cases = [
        (n, k, desc)
        for n in (1, 2, 3, 4, 5, 7, 8, 11, 15)
        for k in (2, 4, 5)
        for desc in (False, True)
    ]
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(check, cases))


def test_global_rank_matches_unpartitioned_window(spark):
    """global_rank (boundary-table rank-select) must equal
    row_number() OVER a global (v, id) order exactly — heavy ties
    spanning bucket boundaries, groups of unequal size, and empty-ish
    buckets; grouped and ungrouped forms."""
    import pyspark.sql.functions as SF
    from pyspark.sql import Window as W

    from etl_8million_data__spark.operators.partitioning import global_rank

    vals = [0, 1, 5, 5, 5, 7, 12, 12, 13, 25, 25, 25, 25, 40, 99]
    rows = [(i, vals[i % len(vals)], f"g{i % 3}") for i in range(47)]
    df = spark.createDataFrame(rows, "id long, v long, grp string")
    bucket = SF.floor(SF.col("v") / 10).cast("bigint")

    # ungrouped
    want = {
        r.id: r.rn
        for r in df.select(
            "id", SF.row_number().over(W.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    got = {
        r.id: r.grank
        for r in global_rank(df, "v", "id", bucket).collect()
    }
    assert got == want

    # grouped
    want_g = {
        r.id: r.rn
        for r in df.select(
            "id",
            SF.row_number().over(W.partitionBy("grp").orderBy("v", "id")).alias("rn"),
        ).collect()
    }
    got_g = {
        r.id: r.grank
        for r in global_rank(df, "v", "id", bucket, group_cols=("grp",)).collect()
    }
    assert got_g == want_g


def test_id_bucket_py_matches_spark(spark):
    """id_bucket_py is the driver-side twin of id_bucket: the literal
    bucket-prune paths (golden/forget bounded deltas) compute bucket
    sets in pure Python from collected key lists — a divergence would
    prune reads to the WRONG buckets and silently miss rows."""
    from etl_8million_data__spark.operators.partitioning import (
        id_bucket,
        id_bucket_py,
    )

    vals = [0, 1, 7, 16, 12345, -3, 10**12, 999999937]
    for nb in (16, 64, 256):
        df = spark.createDataFrame([(v,) for v in vals], "k long").select(
            "k", id_bucket(F.col("k"), nb).alias("b")
        )
        got = {r["k"]: r["b"] for r in df.collect()}
        assert got == {v: id_bucket_py(v, nb) for v in vals}, nb
