"""BPE vocabulary induction: greedy-fold semantics and training
invariants (the oracle parity itself is covered by the registry gate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.operators.bpe import apply_merge, bpe_train, char_seq


def test_apply_merge_greedy_left_to_right(spark):
    # the cases where a string replace() would diverge from greedy BPE
    cases = [
        ("a a a a", "a a", "aa aa"),
        ("a a a", "a a", "aa a"),
        ("aa a b", "aa a", "aaa b"),
        ("x a b y", "a b", "x ab y"),
        ("a b a b", "a b", "ab ab"),
        ("b a a b", "a b", "b a ab"),
        ("a", "a b", "a"),
        ("q r s", None, "q r s"),
    ]
    df = spark.createDataFrame(cases, "seq string, pair string, want string")
    got = df.select(
        "want", apply_merge(F.col("seq"), F.col("pair")).alias("got")
    ).collect()
    for r in got:
        assert r.got == r.want


def test_char_seq_roundtrip(spark):
    df = spark.createDataFrame([("spark",), ("a",), ("xy",)], "token string")
    rows = df.select("token", char_seq(F.col("token")).alias("seq")).collect()
    for r in rows:
        assert r.seq.replace(" ", "") == r.token
        assert len(r.seq.split(" ")) == len(r.token)


def test_bpe_train_invariants(spark):
    vocab = spark.createDataFrame(
        [("lower", 10), ("lowest", 6), ("newer", 8), ("wider", 4), ("new", 5)],
        "token string, cnt long",
    )
    merges, seg = bpe_train(vocab, n_merges=4)
    mrows = merges.orderBy("merge_no").collect()
    # weights never increase round over round (each merge removes the
    # current global max; later maxima cannot exceed it)
    weights = [r.weight for r in mrows]
    assert weights == sorted(weights, reverse=True)
    # 'w e' dominates (lower 10 + lowest 6 + newer 8 = 24, vs 'e r' at
    # lower 10 + newer 8 + wider 4 = 22)
    assert mrows[0].pair == "w e" and mrows[0].weight == 24
    srows = seg.collect()
    for r in srows:
        # segmentation is a partition of the original characters
        assert r.seq.replace(" ", "") == r.token
        assert 1 <= r.n_symbols <= len(r.token)


def _py_greedy_merge(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge application."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def test_apply_merge_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    syms = st.lists(
        st.sampled_from(["a", "b", "ab", "ba", "x", "yz"]), min_size=1, max_size=12
    )
    pair = st.sampled_from([("a", "b"), ("a", "a"), ("ab", "a"), ("x", "yz")])

    @given(st.lists(st.tuples(syms, pair), min_size=1, max_size=8))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(cases):
        rows = [
            (" ".join(s), f"{a} {b}", " ".join(_py_greedy_merge(s, a, b)))
            for s, (a, b) in cases
        ]
        df = spark.createDataFrame(rows, "seq string, pair string, want string")
        got = df.select(
            "want", apply_merge(F.col("seq"), F.col("pair")).alias("got")
        ).collect()
        for r in got:
            assert r.got == r.want

    check()
