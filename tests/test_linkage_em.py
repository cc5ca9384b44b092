"""EM identifiability hardening (plans/behavioral.linkage_em_parameters):
with u initialized at the frequency-based chance-agreement estimate, the
5-round EM must RECOVER the fixture's constructed mixture — match
prevalence and per-field corruption rates are known by construction —
instead of drifting to the 3x-inflated match class the naive symmetric
init produced; and the label direction (m >= u per field, strictly on
at least one) must hold, pinned by the query's own driver-side guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.plans.behavioral import (
    _linkage_candidate_pairs,
    _linkage_merged,
    linkage_em_parameters,
)

# sf0.01 gives 9,551 candidates / 375 true pairs — enough signal for a
# tolerance gate; the session fixture's sf0.001 (221 candidates, 19
# true) is too small for ±-band claims on the bal field.
SF = "/root/testdata/sf0.01"


def test_em_recovers_constructed_mixture(spark):
    got = linkage_em_parameters(spark, SF).first()

    # ground truth from the construction itself (not hand-pinned
    # numbers): p = true pairs / candidates; m = per-field agreement
    # rate over the true pairs (name prefix survives truncation -> 1.0;
    # bal kept for custkey%8==0, half the corrupted records -> ~0.5;
    # seg always kept -> 1.0)
    pairs = _linkage_candidate_pairs(_linkage_merged(spark, SF))
    truth = pairs.agg(
        (
            F.sum(F.when(F.col("a_key") == F.col("orig_key"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("p"),
        F.avg(
            F.when(F.col("a_key") == F.col("orig_key"), F.col("ag_bal"))
        ).alias("m_bal"),
    ).first()

    assert abs(got["p_match_micro"] / 1e6 - truth["p"]) <= 0.01, (
        got["p_match_micro"],
        truth["p"],
    )
    assert abs(got["m_bal_micro"] / 1e6 - truth["m_bal"]) <= 0.10, (
        got["m_bal_micro"],
        truth["m_bal"],
    )
    assert got["m_name_micro"] >= 990_000
    assert got["m_seg_micro"] >= 990_000

    # direction pins (the query itself raises on violation; assert the
    # contract here too so a silent guard removal fails the suite)
    for m, u in (
        ("m_name_micro", "u_name_micro"),
        ("m_bal_micro", "u_bal_micro"),
        ("m_seg_micro", "u_seg_micro"),
    ):
        assert got[m] >= got[u], (m, got[m], u, got[u])
    assert any(
        got[m] > got[u]
        for m, u in (
            ("m_name_micro", "u_name_micro"),
            ("m_bal_micro", "u_bal_micro"),
            ("m_seg_micro", "u_seg_micro"),
        )
    )


def test_em_recovers_nonmatch_agreement_rates(spark):
    """The u side of the mixture, same construction-truth discipline:
    recovered non-match agreement rates must land within a band of the
    EMPIRICAL agreement rates over the candidate pairs that are not
    true matches (round-12 completion of the r10 tolerance ask — the m
    side and prevalence are gated above)."""
    got = linkage_em_parameters(spark, SF).first()
    pairs = _linkage_candidate_pairs(_linkage_merged(spark, SF))
    nm = pairs.filter(
        F.col("orig_key").isNull() | (F.col("a_key") != F.col("orig_key"))
    )
    truth = nm.agg(
        F.avg("ag_name").alias("u_name"),
        F.avg("ag_bal").alias("u_bal"),
        F.avg("ag_seg").alias("u_seg"),
    ).first()
    for field in ("name", "bal", "seg"):
        rec = got[f"u_{field}_micro"] / 1e6
        want = truth[f"u_{field}"]
        assert abs(rec - want) <= 0.05, (field, rec, want)
