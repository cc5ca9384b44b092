"""Directed containment join: the doc-in-doc cases Jaccard misses.
(Exactness vs the naive definition is proven by the registry oracle.)
"""

from __future__ import annotations

from etl_8million_data__spark.operators.dedup import (
    containment_pairs,
    prefix_filter_pairs,
)


def _docs(spark):
    body = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(12))  # strict prefix of body
    other = " ".join(f"z{i}" for i in range(40))
    return spark.createDataFrame(
        [(1, body), (2, quote), (3, other), (4, body)],
        "doc_id long, text string",
    )


def test_containment_catches_doc_in_doc(spark):
    d = _docs(spark)
    rows = {
        (r.inner_doc, r.outer_doc): r.containment
        for r in containment_pairs(d).collect()
    }
    # the quote is fully contained in both copies of the body...
    assert rows[(2, 1)] == 1.0 and rows[(2, 4)] == 1.0
    # ...but not vice versa (asymmetry), and the unrelated doc is out
    assert (1, 2) not in rows
    assert not any(3 in p for p in rows)
    # identical docs contain each other (mutual containment = near-equal)
    assert rows[(1, 4)] == 1.0 and rows[(4, 1)] == 1.0


def test_jaccard_join_misses_the_superset_pair(spark):
    d = _docs(spark)
    jac = {
        (r.doc_a, r.doc_b) for r in prefix_filter_pairs(d).collect()
    }
    # Jaccard(quote, body) = 10/38 < 1/2: the doc-in-doc pair is
    # (correctly) absent from the Jaccard join -- containment's reason
    # to exist.
    assert (2, 1) not in jac and (1, 2) not in jac
    assert (1, 4) in jac  # identical pair still found


def test_containment_lossless_vs_naive_random_corpus(spark):
    """Pruned plan == naive definition on a randomized corpus (fixed
    seed): prefix filtering + position filter drop NO qualifying pair."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for i in range(60):
        n = rng.randint(3, 25)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # inject guaranteed containments: doc 100+i = doc i plus a suffix
    for i in range(5):
        docs.append((100 + i, docs[i][1] + " " + " ".join(rng.choice(vocab) for _ in range(3))))
    d = spark.createDataFrame(docs, "doc_id long, text string")

    pruned = {
        (r.inner_doc, r.outer_doc, r.common)
        for r in containment_pairs(d, 4, 5).collect()
    }

    from etl_8million_data__spark.operators.dedup import doc_shingle_frame

    sh = doc_shingle_frame(d, "text", "doc_id", 3)
    ex = sh.select(F.col("doc_id").alias("_id"), F.explode("shingles").alias("g"))
    sz = sh.select(F.col("doc_id").alias("_id"), F.size("shingles").alias("n"))
    naive = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a._id") != F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("i"), F.col("b._id").alias("o"))
        .agg(F.count(F.lit(1)).alias("common"))
        .join(sz.select(F.col("_id").alias("i"), F.col("n")), "i")
        .filter(F.col("common") * 5 >= 4 * F.col("n"))
    )
    expect = {(r.i, r.o, r.common) for r in naive.collect()}
    assert pruned == expect
    assert len(expect) >= 5  # the injected containments are in there


def test_fuzzy_contamination_is_cross_source_and_nonvacuous(spark, sf_dir):
    """Every contamination hit must pair a src0 (benchmark) doc with a
    non-src0 (train) doc, the fixture must actually contain leaks
    (7 at sf0.001 / 2 at sf0.01 — verified when the query was built,
    so a fixture reshuffle that empties the audit fails loudly), and
    every hit must clear the 1/2 containment gate."""
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.plans import all_queries

    rows = all_queries()["corpus_fuzzy_contamination"].build(spark, sf_dir).collect()
    assert rows, "contamination audit is vacuous on this fixture"
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    for r in rows:
        assert src[r.bench_doc] == "src0"
        assert src[r.train_doc] != "src0"
        assert r.common * 2 >= r.n_bench
        assert 0.5 <= r.containment <= 1.0
