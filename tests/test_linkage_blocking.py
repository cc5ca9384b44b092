"""Gates for the round-10 linkage blocking swap: the SNM candidate
generator must (a) keep EVERY constructed true pair — a blocking scheme
that bounds volume by dropping recall passes volume gates vacuously
(the fixture-degeneracy lesson) — and (b) hold candidate volume to the
N·w linear bound that replaced the nation-blocked join's Σ(block²)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.plans.behavioral import (
    _LINK_W,
    _linkage_candidate_pairs,
    _linkage_merged,
)


def test_snm_blocking_full_recall_and_linear_volume(spark, sf_dir):
    merged = _linkage_merged(spark, sf_dir).localCheckpoint(eager=True)
    pairs = _linkage_candidate_pairs(merged).localCheckpoint(eager=True)

    n_true_total = merged.filter(F.col("src") == 1).count()
    found_true = pairs.filter(F.col("a_key") == F.col("orig_key")).count()
    # every corrupted record's source sits within the SNM window: the
    # truncated name sorts at most ~9 positions before its source
    assert found_true == n_true_total, (
        f"SNM window {_LINK_W} misses true pairs: {found_true}/{n_true_total}"
    )

    n = merged.count()
    n_cand = pairs.count()
    assert n_cand <= n * _LINK_W, (n_cand, n, _LINK_W)

    # each unordered cross-file pair appears exactly once
    assert pairs.select("a_key", "b_key").distinct().count() == n_cand


def test_snm_volume_grows_linearly_vs_nation_blocked_quadratic(spark):
    """The reason for the swap, measured: across a 10x customer-file
    growth (sf0.001 -> sf0.01) the SNM candidate count grows ~linearly
    (<= the data ratio with slack) while the round-9 nation-blocked
    join's Σ |a_block|·|b_block| grows ~quadratically — at small n the
    fixed window w makes SNM's N·w the LARGER of the two (crossover is
    between sf0.01 and sf0.1), which is why this gate is about growth
    RATES, not absolute counts at toy scale."""
    import os

    scales = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    if not all(os.path.isdir(s) for s in scales):
        import pytest

        pytest.skip("both fixture scales required")
    snm, nation, sizes = [], [], []
    for s in scales:
        merged = _linkage_merged(spark, s).localCheckpoint(eager=True)
        sizes.append(merged.count())
        snm.append(_linkage_candidate_pairs(merged).count())
        nat = _nation_of(spark, s)
        a_n = (
            merged.filter(F.col("src") == 0)
            .join(nat, F.col("rid") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("na"))
        )
        b_n = (
            merged.filter(F.col("src") == 1)
            .join(nat, F.col("orig_key") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("nb"))
        )
        nation.append(
            a_n.join(b_n, "c_nationkey")
            .agg(F.sum(F.col("na") * F.col("nb")))
            .first()[0]
        )
    data_ratio = sizes[1] / sizes[0]
    snm_ratio = snm[1] / max(snm[0], 1)
    nation_ratio = nation[1] / max(nation[0], 1)
    assert snm_ratio <= data_ratio * 1.25, (snm, snm_ratio, data_ratio)
    assert nation_ratio >= data_ratio * 5, (nation, nation_ratio, data_ratio)
    assert snm_ratio < nation_ratio / 4, (snm_ratio, nation_ratio)


def _nation_of(spark, sf_dir):
    from etl_8million_data__spark.catalog import load_table

    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
