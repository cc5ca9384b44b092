"""Sorted-neighborhood dedup: recall/precision vs the exact all-pairs
shingle-Jaccard truth (computable at fixture scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.plans import all_queries


def _truth_pairs(spark, sf_dir, threshold=0.5):
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.dedup import doc_shingle_frame

    sh = doc_shingle_frame(load_table(spark, sf_dir, "documents"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter / (F.size("sa") + F.size("sb") - inter)
    return {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("j"))
        .filter(F.col("j") >= threshold)
        .collect()
    }


def test_snm_recall_and_precision_vs_allpairs(spark, sf_dir):
    """Two-pass SNM over sorted-shingle keys measures recall 1.0 at
    BOTH fixture scales (near-dups share long sorted-shingle prefixes,
    so every planted pair lands within a window-4 neighborhood); the
    exact-Jaccard verify makes precision exact by construction. The
    gate is pinned at 0.9 recall — below measured-perfect only to
    absorb future fixture reshuffles, far above the 0.5 LSH gate on
    the same truth shape."""
    truth = _truth_pairs(spark, sf_dir)
    assert truth, "fixture should contain shingle near-dup pairs"
    snm = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["dedup_sorted_neighborhood_pairs"]
        .build(spark, sf_dir)
        .collect()
    }
    assert snm <= truth, f"false positives: {sorted(snm - truth)[:3]}"
    recall = len(snm) / len(truth)
    assert recall >= 0.9, f"SNM recall {recall:.2f}"


def test_snm_pairs_ordered_and_distinct(spark, sf_dir):
    rows = (
        all_queries()["dedup_sorted_neighborhood_pairs"]
        .build(spark, sf_dir)
        .collect()
    )
    pairs = [(r.doc_a, r.doc_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert all(0.5 <= r.jaccard <= 1.0 for r in rows)
