"""Semantics tests for exact duplicated-substring span coverage
(operators/substring.py) on crafted micro-corpora — overlap merging,
within-doc repetition, short-doc zero rows."""

from __future__ import annotations

from etl_8million_data__spark.operators.substring import duplicated_span_coverage


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = duplicated_span_coverage(df, k=8)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_run_covered_in_both_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    a = f"unique1 unique2 {shared} tail1 tail2"
    b = f"other1 {shared} other2 other3 other4"
    got = _rows(spark, [a, b, "short doc"])
    # one duplicated 8-gram per doc -> 8 covered tokens each
    assert got[0]["dup_positions"] == 1 and got[0]["dup_tokens"] == 8
    assert got[1]["dup_positions"] == 1 and got[1]["dup_tokens"] == 8
    assert got[0]["n_tokens"] == 12 and abs(got[0]["dup_frac"] - 8 / 12) < 1e-12
    # doc with < 8 tokens: present, zero coverage
    assert got[2]["dup_positions"] == 0 and got[2]["dup_tokens"] == 0


def test_overlapping_spans_merge(spark):
    # 9-token shared run duplicated across docs -> two overlapping 8-grams
    # per doc whose union is 9 tokens, not 16.
    shared = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    got = _rows(spark, [f"x {shared}", f"y {shared} z"])
    assert got[0]["dup_positions"] == 2
    assert got[0]["dup_tokens"] == 9
    assert got[1]["dup_tokens"] == 9


def test_within_doc_repetition_counts(spark):
    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    doc = f"{run} sep1 sep2 {run}"  # same 8-gram twice in ONE doc
    got = _rows(spark, [doc, "totally different words here now ok fine yes"])
    assert got[0]["dup_positions"] == 2
    assert got[0]["dup_tokens"] == 16  # disjoint spans: 8 + 8
    assert got[1]["dup_tokens"] == 0


# --- property-based check vs a brute-force Python model -----------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["aa", "bb", "cc", "dd", "ee"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join)


def _model(texts, k=8):
    """Brute-force reference: gram multiset over the whole corpus,
    duplicated grams -> per-doc covered-position set."""
    grams: dict[str, int] = {}
    per_doc = []
    for t in texts:
        toks = t.split(" ") if t else [""]
        spans = []
        for i in range(max(0, len(toks) - k + 1)):
            g = " ".join(toks[i : i + k])
            grams[g] = grams.get(g, 0) + 1
            spans.append((i + 1, g))
        per_doc.append((len(toks), spans))
    out = {}
    for doc_id, (n, spans) in enumerate(per_doc):
        covered: set[int] = set()
        positions = 0
        for s, g in spans:
            if grams[g] >= 2:
                positions += 1
                covered.update(range(s, s + k))
        out[doc_id] = (n, positions, len(covered))
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_span_coverage_matches_brute_force(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_positions"], r["dup_tokens"])
        for r in duplicated_span_coverage(df, k=8).collect()
    }
    assert got == _model(texts)


def test_cut_consistent_with_coverage(spark):
    from etl_8million_data__spark.operators.substring import cut_duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [f"unique1 unique2 {shared} tail1 tail2", f"other1 {shared} other2", "short doc"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cov = {r["doc_id"]: r for r in duplicated_span_coverage(df, k=8).collect()}
    cut = {r["doc_id"]: r for r in cut_duplicated_spans(df, k=8).collect()}
    import hashlib

    for i in range(len(texts)):
        # tokens removed by the cut == tokens covered per the measure
        assert cov[i]["n_tokens"] - cut[i]["n_kept"] == cov[i]["dup_tokens"]
    # doc 0 keeps exactly its non-shared tokens, in order
    expect0 = "unique1 unique2 tail1 tail2"
    assert cut[0]["cleaned_md5"] == hashlib.md5(expect0.encode()).hexdigest()
    # untouched doc: cleaned text is the full normalized text
    assert cut[2]["cleaned_md5"] == hashlib.md5(b"short doc").hexdigest()
