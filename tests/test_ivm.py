"""Incremental join-view maintenance (operators/ivm.py): refreshes must
be delta-sized — old view files never touched, old-side scans bounded
by the delta's join keys — and the maintained view must equal the
full-recompute join under any append split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.ivm import (
    _bounded,
    join_view_delta,
    refresh_join_view,
)


def _file_state(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_mtime_ns, st.st_size)
    return out


def _frames(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return o, c


def test_refresh_equals_full_recompute_and_never_touches_old_files(
    spark, sf_dir, tmp_path
):
    o, c = _frames(spark, sf_dir)
    o_seed = o.filter(F.pmod("o_orderkey", F.lit(5)) != 0)
    o_delta = o.filter(F.pmod("o_orderkey", F.lit(5)) == 0)
    c_seed = c.filter(F.pmod("custkey", F.lit(10)) != 0)
    c_delta = c.filter(F.pmod("custkey", F.lit(10)) == 0)

    view = str(tmp_path / "view")
    # seed build
    refresh_join_view(spark, view, o_seed, c_seed, o.limit(0), c.limit(0), ["custkey"])
    pre = _file_state(view)
    n_seed = spark.read.parquet(view).count()

    # delta refresh exercising all three terms
    appended = refresh_join_view(
        spark, view, o_seed, c_seed, o_delta, c_delta, ["custkey"]
    )
    got = spark.read.parquet(view)
    want = o.join(c, "custkey")
    assert got.count() == want.count() == n_seed + appended
    # value-level equality, not just counts
    key = ["custkey", "o_orderkey"]
    assert got.select(*key).exceptAll(want.select(*key)).count() == 0
    assert want.select(*key).exceptAll(got.select(*key)).count() == 0

    # old view files byte-identical (append-only refresh)
    post = _file_state(view)
    for rel, sig in pre.items():
        if rel.endswith(".parquet"):
            assert post.get(rel) == sig, f"seed view file rewritten: {rel}"

    # empty-delta refresh is a no-op: nothing appended, nothing touched
    snap = _file_state(view)
    assert (
        refresh_join_view(spark, view, o, c, o.limit(0), c.limit(0), ["custkey"]) == 0
    )
    assert _file_state(view) == snap


def test_delta_join_terms_cover_cross_appends(spark, sf_dir):
    """A fact row whose dimension row arrives in a LATER batch must
    appear exactly once after both deltas — the A_old x deltaB term."""
    o, c = _frames(spark, sf_dir)
    # orders of customers divisible by 10, customers arriving late
    o_old = o.filter(F.pmod("custkey", F.lit(10)) == 0)
    c_late = c.filter(F.pmod("custkey", F.lit(10)) == 0)
    d = join_view_delta(o_old, c.limit(0), o.limit(0), c_late, ["custkey"])
    assert d.count() == o_old.count()
    # and nothing doubles when the same rows also flow as deltaA x deltaB
    d2 = join_view_delta(o.limit(0), c.limit(0), o_old, c_late, ["custkey"])
    assert d2.count() == o_old.count()


def test_stream_join_view_equals_batch_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """Streaming the orders fact (4 micro-batches) against the static
    customer dim must leave the view equal to the full batch join, and
    a full replay under a fresh checkpoint must append nothing
    (skip-existing by fact PK)."""
    import os as _os

    from etl_8million_data__spark.operators.ivm import stream_join_view_increment

    o, c = _frames(spark, sf_dir)
    src = str(tmp_path / "src")
    o.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    view = str(tmp_path / "view")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_join_view_increment(
            stream, c, view, ["custkey"], "o_orderkey", str(tmp_path / ckpt)
        ).awaitTermination()

    run("c1")
    got = spark.read.parquet(view)
    want = o.join(c, "custkey")
    assert got.count() == want.count()
    key = ["custkey", "o_orderkey"]
    assert got.select(*key).exceptAll(want.select(*key)).count() == 0

    n_files = len(
        [f for f in _os.listdir(view) if f.endswith(".parquet")]
    )
    run("c2")  # replay: every fact key already in the view
    assert spark.read.parquet(view).count() == want.count()
    assert (
        len([f for f in _os.listdir(view) if f.endswith(".parquet")]) == n_files
    )


def test_agg_view_delta_group_move_and_empty_group_drop(spark):
    """Retraction deltas: an update batch that moves EVERY row out of a
    group must leave the maintained view without that group (count
    reaches zero -> dropped), and the merged view must equal a fresh
    recompute over the post-upsert state."""
    from etl_8million_data__spark.operators.ivm import agg_view_delta, apply_agg_delta

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "pk long, grp string, cents long",
    )
    # both 'a' rows move to 'c' with new values; pk 4 is an insert
    updates = spark.createDataFrame(
        [(1, "c", 11), (2, "c", 21), (4, "b", 40)],
        "pk long, grp string, cents long",
    )
    view0 = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s_cents"),
    )
    delta = agg_view_delta(base, updates, "pk", ["grp"], ["cents"])
    got = {
        r.grp: (r.n, r.s_cents)
        for r in apply_agg_delta(view0, delta, ["grp"], ["cents"]).collect()
    }
    assert got == {"b": (2, 70), "c": (2, 32)}  # 'a' gone, 'c' born


def test_stream_agg_view_upserts_equals_recompute_and_replays(spark, sf_dir, tmp_path):
    """Streaming keyed upserts through the retraction maintainer must
    leave the view equal to a recompute over the final base state, and
    a full replay under a fresh checkpoint must change nothing (zero
    deltas: old == new for every redelivered key)."""
    from etl_8million_data__spark.operators.ivm import stream_agg_view_upserts

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.lit(0).cast("long").alias("ver"),
    )
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    o.write.parquet(base)
    o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s_cents"),
    ).coalesce(1).write.parquet(view)

    # update stream: 2 files -> 2 micro-batches; doubled cents, some
    # group moves, some brand-new keys, all at ver=1
    upd = o.filter(F.col("pk") % 10 == 0).select(
        "pk",
        F.when(F.col("pk") % 20 == 0, F.lit("X-MOVED")).otherwise(F.col("grp")).alias("grp"),
        (F.col("cents") * 2).alias("cents"),
        F.lit(1).cast("long").alias("ver"),
    )
    ins = o.filter(F.col("pk") % 50 == 0).select(
        (-(F.col("pk") + 1)).alias("pk"), "grp", "cents", F.lit(1).cast("long").alias("ver")
    )
    src = str(tmp_path / "src")
    upd.unionByName(ins).repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_agg_view_upserts(
            stream, base, view, "pk", ["grp"], ["cents"], "ver",
            str(tmp_path / ckpt),
        ).awaitTermination()

    run("c1")
    got = {
        r.grp: (r.n, r.s_cents) for r in spark.read.parquet(view).collect()
    }
    want = {
        r.grp: (r.n, r.s_cents)
        for r in spark.read.parquet(base)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s_cents"),
        )
        .collect()
    }
    assert got == want and "X-MOVED" in got

    run("c2")  # replay: zero deltas everywhere
    got2 = {
        r.grp: (r.n, r.s_cents) for r in spark.read.parquet(view).collect()
    }
    assert got2 == got


def test_bounded_scan_pushes_literal_key_filter(spark, sf_dir):
    """The old-side scan of a cross term must carry the delta's keys as
    a pushed literal filter (runtime DPP is unreliable on this build —
    the upsert lesson), so parquet row-group pruning can bite."""
    o, c = _frames(spark, sf_dir)
    c_delta = c.filter(F.col("custkey").isin([1, 2, 3]))
    bounded = _bounded(o, c_delta, ["custkey"])
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    # the alias resolves back to the scan column (o_custkey)
    assert "PushedFilters: [In(" in plan, plan[:2000]
    assert bounded.count() == o.filter(F.col("custkey").isin([1, 2, 3])).count()

    # empty delta: zero rows, no history scan needed
    assert _bounded(o, c.limit(0), ["custkey"]).count() == 0


def test_retract_join_view_blast_radius_and_replay(spark, sf_dir, tmp_path):
    """Round-10 retraction door: deleting on the BUCKET key rewrites
    only the victims' computed buckets (untouched buckets
    byte-identical); deleting on a NON-bucket key takes the
    located-partition path and likewise touches only partitions
    containing victims; re-running either retraction is a provable
    no-op (miss never rewrites) — the at-least-once contract."""
    from etl_8million_data__spark.operators.ivm import retract_join_view
    from etl_8million_data__spark.operators.partitioning import id_bucket

    o, c = _frames(spark, sf_dir)
    view = str(tmp_path / "view_b")
    (
        o.join(c, "custkey")
        .withColumn("bucket", id_bucket(F.col("custkey"), 16))
        .write.partitionBy("bucket")
        .parquet(view)
    )
    full = spark.read.parquet(view).count()

    # (1) bucket-key retraction: GDPR erase of two customers
    victims = c.orderBy("custkey").limit(2).select("custkey")
    vkeys = [r["custkey"] for r in victims.collect()]
    touched = {
        r["b"]
        for r in victims.select(id_bucket(F.col("custkey"), 16).alias("b")).collect()
    }
    pre = _file_state(view)
    n1 = retract_join_view(spark, view, victims, "custkey")
    assert n1 > 0
    post = _file_state(view)
    for rel, sig in pre.items():
        top = rel.split(os.sep)[0]
        if top.startswith("bucket=") and int(top[7:]) not in touched:
            assert post.get(rel) == sig, f"untouched bucket rewritten: {rel}"
    v = spark.read.parquet(view)
    assert v.filter(F.col("custkey").isin(vkeys)).count() == 0
    assert v.count() == full - n1

    # replay: miss never rewrites
    snap = _file_state(view)
    assert retract_join_view(spark, view, victims, "custkey") == 0
    assert _file_state(view) == snap

    # (2) non-bucket-key retraction via located partitions
    okeys = [
        r["o_orderkey"]
        for r in spark.read.parquet(view)
        .orderBy("o_orderkey")
        .limit(3)
        .select("o_orderkey")
        .collect()
    ]
    # materialized victim frame: a lazy read-plan would pin the PRE-delete
    # file listing and fail on re-execution after the rewrite
    ovictims = spark.createDataFrame([(k,) for k in okeys], "o_orderkey long")
    located = {
        r["bucket"]
        for r in spark.read.parquet(view)
        .filter(F.col("o_orderkey").isin(okeys))
        .select("bucket")
        .distinct()
        .collect()
    }
    pre2 = _file_state(view)
    n2 = retract_join_view(
        spark, view, ovictims, "o_orderkey", locate_partitions=["bucket"]
    )
    assert n2 == len(okeys)
    post2 = _file_state(view)
    for rel, sig in pre2.items():
        top = rel.split(os.sep)[0]
        if top.startswith("bucket=") and int(top[7:]) not in located:
            assert post2.get(rel) == sig, f"untouched bucket rewritten: {rel}"
    v2 = spark.read.parquet(view)
    assert v2.filter(F.col("o_orderkey").isin(okeys)).count() == 0
    assert v2.count() == full - n1 - n2

    # replay no-op on the located path too
    snap2 = _file_state(view)
    assert (
        retract_join_view(
            spark, view, ovictims, "o_orderkey", locate_partitions=["bucket"]
        )
        == 0
    )
    assert _file_state(view) == snap2


def test_stream_erase_propagates_base_and_view(spark, sf_dir, tmp_path):
    """Streaming twin of the retraction door: a stream of GDPR erase
    requests drives stream_forget_requests against BOTH the base fact
    and the derived join view in one job — after the stream drains the
    view equals a recompute over the post-delete inputs, and a full
    replay under a fresh checkpoint changes nothing (forget is
    idempotent per id)."""
    from etl_8million_data__spark.operators.forget import stream_forget_requests
    from etl_8million_data__spark.operators.partitioning import id_bucket

    o, c = _frames(spark, sf_dir)
    base = str(tmp_path / "base")
    o.withColumn("bucket", id_bucket(F.col("custkey"), 16)).write.partitionBy(
        "bucket"
    ).parquet(base)
    view = str(tmp_path / "view_s")
    (
        o.join(c, "custkey")
        .withColumn("bucket", id_bucket(F.col("custkey"), 16))
        .write.partitionBy("bucket")
        .parquet(view)
    )

    victims = c.orderBy(F.desc("custkey")).limit(3).select("custkey")
    vkeys = [r["custkey"] for r in victims.collect()]
    src = str(tmp_path / "req")
    victims.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        stream_forget_requests(
            stream,
            [(base, "custkey", None), (view, "custkey", None)],
            str(tmp_path / ckpt),
        ).awaitTermination()

    run("ck1")
    got_base = spark.read.parquet(base)
    got_view = spark.read.parquet(view)
    assert got_base.filter(F.col("custkey").isin(vkeys)).count() == 0
    assert got_view.filter(F.col("custkey").isin(vkeys)).count() == 0
    want = o.filter(~F.col("custkey").isin(vkeys)).join(c, "custkey")
    assert got_view.count() == want.count()

    snap_b, snap_v = _file_state(base), _file_state(view)
    run("ck2")  # replay: all victims already erased -> byte-identical
    assert _file_state(base) == snap_b
    assert _file_state(view) == snap_v


def test_agg_view_delete_delta_empties_groups(spark):
    """Delete retraction: erasing every row of a group must DROP the
    group from the view (not leave a zero row); partial deletes shrink
    counts and sums exactly; deleting everything empties the view."""
    from etl_8million_data__spark.operators.ivm import (
        agg_view_delete_delta,
        apply_agg_delta,
    )

    base = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "B", 5), (4, "B", 7), (5, "C", 1)],
        "pk long, grp string, v long",
    )
    view0 = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s_v"),
    )
    victims = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    delta = agg_view_delete_delta(base, victims, "pk", ["grp"], ["v"])
    got = {
        r["grp"]: (r["n"], r["s_v"])
        for r in apply_agg_delta(view0, delta, ["grp"], ["v"]).collect()
    }
    assert got == {"B": (1, 7), "C": (1, 1)}  # A dropped, B shrunk, C intact

    all_victims = base.select("pk")
    d2 = agg_view_delete_delta(base, all_victims, "pk", ["grp"], ["v"])
    assert apply_agg_delta(view0, d2, ["grp"], ["v"]).count() == 0

    # deleting a pk that does not exist is a zero delta (replay safety)
    ghost = spark.createDataFrame([(99,)], "pk long")
    d3 = agg_view_delete_delta(base, ghost, "pk", ["grp"], ["v"])
    assert d3.count() == 0
