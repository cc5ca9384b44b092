"""Hot-token robustness for the persisted text index — the phrase/BM25
counterpart of tests/test_dedup_skew.py (verdict r8 task #5): with a
stopword in 80% of documents (5 occurrences each), the probes must stay
balanced and their join inputs must stay bounded by the QUERY terms'
document frequencies, never by the corpus's hottest token.

Fixture: 200 docs. 160 carry the stopword 'zebra' x5; every doc carries
a unique rare token 'uniq<i>'; 10 docs embed the planted phrase
'alpha beta gamma'; the token 'alpha' additionally appears alone in 5
more docs (so the phrase's first word has df > phrase df)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.search_index import (
    bm25_candidates,
    bm25_probe,
    build_postings,
    phrase_candidates,
    phrase_probe,
)

STOP, N_DOCS, N_STOP, N_PHRASE, N_ALPHA_ONLY = "zebra", 200, 160, 10, 5


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    rows = []
    for i in range(N_DOCS):
        words = [f"uniq{i}", "filler"]
        if i < N_STOP:
            words += [STOP] * 5
        if i < N_PHRASE:
            words += ["alpha", "beta", "gamma"]
        elif i < N_PHRASE + N_ALPHA_ONLY:
            words += ["alpha"]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("skewidx") / "postings")
    build_postings(docs, path)
    return path


def _qframe(spark, phrase):
    return (
        spark.createDataFrame([(phrase,)], "phrase string")
        .select(F.col("phrase"), F.split("phrase", " ").alias("ws"))
        .select("phrase", F.size("ws").alias("n_words"),
                F.posexplode("ws").alias("off", "token"))
        .select(
            "phrase", "n_words", F.col("off").cast("bigint").alias("off"), "token",
            F.substring(F.md5(F.encode(F.col("token"), "UTF-8")), 1, 1).alias("pfx"),
        )
    )


def test_phrase_join_input_bounded_by_query_terms_df(spark, skew_index):
    """Probing a phrase that does NOT contain the stopword must join
    exactly the phrase tokens' postings — Σ df of the query terms —
    even though the stopword holds ~47% of all postings."""
    cand = phrase_candidates(spark, skew_index, _qframe(spark, "alpha beta gamma"))
    # alpha: 10 phrase docs + 5 alpha-only; beta/gamma: 10 each
    assert cand.count() == (N_PHRASE + N_ALPHA_ONLY) + N_PHRASE + N_PHRASE
    total_postings = spark.read.parquet(skew_index).count()
    assert cand.count() < total_postings * 0.05  # nowhere near corpus-sized

    hits = phrase_probe(
        spark, skew_index, spark.createDataFrame([("alpha beta gamma",)],
                                                 "phrase string")
    )
    assert {r.doc_id for r in hits.collect()} == set(range(N_PHRASE))


def test_phrase_with_stopword_has_no_straggler_key(spark, skew_index):
    """A phrase CONTAINING the stopword pays its df (inherent — those
    postings are candidates), but the anchor aggregate's key includes
    doc_id, so candidates spread across the stopword's documents: the
    largest per-key group stays <= n_words and keys number in the
    hundreds — no single reducer key absorbs the hot token."""
    cand = phrase_candidates(
        spark, skew_index, _qframe(spark, f"{STOP} alpha")
    ).localCheckpoint(eager=True)
    # stopword df: 160 docs x 5 occurrences; alpha: 15 docs x 1
    assert cand.count() == N_STOP * 5 + N_PHRASE + N_ALPHA_ONLY
    groups = cand.groupBy("phrase", "n_words", "doc_id", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    mx = groups.agg(F.max("n")).first()[0]
    assert mx <= 2  # n_words — a group can never exceed the phrase length
    n_keys = groups.count()
    assert n_keys >= N_STOP  # keys spread over the stopword's documents


def test_bm25_candidates_bounded_and_scores_exact_under_skew(spark, skew_index):
    """BM25 for a rare term in the stopword-heavy corpus: the candidate
    join touches only that term's postings, and the score matches the
    hand-computed RSJ-BM25 on the fixture (the hot token influences the
    score ONLY through dl/avgdl, as it should)."""
    terms = spark.createDataFrame([("uniq7",)], "term string")
    cand = bm25_candidates(spark, skew_index, terms)
    assert cand.count() == 1  # df(uniq7) = 1, tf = 1

    got = bm25_probe(spark, skew_index, terms, k=5).collect()
    assert len(got) == 1 and got[0].doc_id == 7
    # hand-computed: doc 7 has tokens uniq7, filler, zebra*5, alpha beta
    # gamma -> dl = 10
    dl = {r.doc_id: r.dl
          for r in spark.read.parquet(f"{skew_index}/_doclen").collect()}
    assert dl[7] == 10
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    tf, dfq = 1.0, 1.0
    want = ((n_docs - dfq + 0.5) / (dfq + 0.5)) * (
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl[7] / avgdl))
    )
    assert abs(got[0].bm25 - want) < 1e-9


def test_bm25_stopword_term_spreads_tf_by_doc(spark, skew_index):
    """Scoring the stopword itself: tf aggregation keys on (token,
    doc_id), so the 800 hot postings collapse into 160 per-doc rows —
    bounded by df, and df(zebra) dominates nothing downstream (the df
    aggregate is |terms| rows). The probe also ranks correctly: every
    top-k doc is a stopword doc with identical tf, tie-broken by
    doc_id."""
    terms = spark.createDataFrame([(STOP,)], "term string")
    cand = bm25_candidates(spark, skew_index, terms)
    assert cand.count() == N_STOP * 5
    tf = cand.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    assert tf.count() == N_STOP
    assert tf.agg(F.max("tf")).first()[0] == 5

    got = bm25_probe(spark, skew_index, terms, k=10).collect()
    assert len(got) == 10
    assert all(r.doc_id < N_STOP for r in got)
