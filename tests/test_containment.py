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
