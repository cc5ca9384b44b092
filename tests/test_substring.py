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


# --- CDC insertion-stability -------------------------------------------

def test_cdc_chunks_survive_prefix_insertion(spark):
    """The defining CDC property: prepending text only perturbs chunks
    up to the first hash boundary — every later chunk fingerprint
    survives verbatim (fixed-width chunking would shift ALL of them)."""
    import hashlib

    words = [f"w{i}" for i in range(120)]
    base = " ".join(words)
    shifted = "inserted preamble tokens " + base

    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    # same chunking expressions as corpus_content_defined_chunks, over
    # the crafted two-doc frame
    from pyspark.sql import Window, functions as F
    from etl_8million_data__spark.operators.text import tokens

    def chunks_of(frame):
        pos = frame.select(
            "doc_id", tokens(F.col("text")).alias("toks")
        ).select("doc_id", F.posexplode("toks").alias("pos0", "tok")).select(
            "doc_id", (F.col("pos0") + 1).alias("p"), "tok",
            F.when(F.substring(F.md5(F.encode("tok", "UTF-8")), 1, 1) == "0", 1)
            .otherwise(0).alias("b"),
        )
        w = (Window.partitionBy("doc_id").orderBy("p")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ch = pos.withColumn("chunk_id", F.sum("b").over(w))
        joined = F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("p", "tok"))),
                        lambda s: s["tok"]), " ")
        return ch.groupBy("doc_id", "chunk_id").agg(
            F.md5(F.encode(joined, "UTF-8")).alias("m"))

    got = chunks_of(df).collect()
    a_chunks = {r.m for r in got if r.doc_id == 0}
    b_chunks = {r.m for r in got if r.doc_id == 1}
    # doc 0's first chunk merges into the perturbed head of doc 1; every
    # OTHER chunk must reappear byte-identical. Identify doc 0's head
    # chunk md5 by recomputing its first boundary in Python.
    toks = base.split(" ")
    bounds = [i for i, t in enumerate(toks)
              if hashlib.md5(t.encode()).hexdigest().startswith("0")]
    assert bounds, "fixture words must contain at least one boundary"
    head_md5 = hashlib.md5(" ".join(toks[: bounds[0]]).encode()).hexdigest()
    assert a_chunks - {head_md5} <= b_chunks
    assert len(a_chunks - {head_md5}) >= 2  # property is non-vacuous
