"""Persisted positional inverted index (operators/search_index.py):
build/probe semantics incl. repeated-word phrases, skip-existing
appends, and partition-pruned probe scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.operators.search_index import (
    append_documents,
    build_postings,
    phrase_probe,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _phrases(spark, ps):
    return spark.createDataFrame([(p,) for p in ps], "phrase string")


def test_build_and_phrase_probe(spark, tmp_path):
    idx = str(tmp_path / "pidx")
    build_postings(
        _docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "a quick brown cat naps while the quick brown fox rests"),
                (3, "nothing to see here"),
            ],
        ),
        idx,
    )
    got = {
        (r.phrase, r.doc_id): (r.n_occ, r.first_pos)
        for r in phrase_probe(
            spark, idx, _phrases(spark, ["quick brown fox", "the lazy dog"])
        ).collect()
    }
    assert got[("quick brown fox", 1)] == (1, 1)
    assert got[("quick brown fox", 2)] == (1, 7)
    assert got[("the lazy dog", 1)] == (1, 6)
    assert ("the lazy dog", 2) not in got
    assert not any(d == 3 for (_, d) in got)


def test_repeated_word_phrase_needs_distinct_offsets(spark, tmp_path):
    idx = str(tmp_path / "ridx")
    build_postings(
        _docs(spark, [(1, "buffalo buffalo buffalo"), (2, "one buffalo only")]),
        idx,
    )
    got = {
        (r.phrase, r.doc_id): (r.n_occ, r.first_pos)
        for r in phrase_probe(
            spark, idx, _phrases(spark, ["buffalo buffalo"])
        ).collect()
    }
    # overlapping occurrences at anchors 0 and 1; single-word doc absent
    assert got[("buffalo buffalo", 1)] == (2, 0)
    assert ("buffalo buffalo", 2) not in got


def test_append_skip_existing_and_searchability(spark, tmp_path):
    idx = str(tmp_path / "aidx")
    build_postings(_docs(spark, [(1, "alpha beta gamma")]), idx)
    # replaying an indexed doc appends nothing
    assert append_documents(_docs(spark, [(1, "alpha beta gamma")]), idx) == 0
    # a new doc is appended and immediately searchable
    assert append_documents(_docs(spark, [(2, "delta alpha beta")]), idx) == 1
    got = {
        r.doc_id: r.first_pos
        for r in phrase_probe(spark, idx, _phrases(spark, ["alpha beta"])).collect()
    }
    assert got == {1: 0, 2: 1}
    # replay of the append is a no-op (idempotence through skip-existing)
    assert append_documents(_docs(spark, [(2, "delta alpha beta")]), idx) == 0


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    idx = str(tmp_path / "didx")
    build_postings(
        _docs(spark, [(i, f"w{i} common filler words here") for i in range(20)]), idx
    )
    df = phrase_probe(spark, idx, _phrases(spark, ["common filler"]))
    extended = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    assert "dynamicpruning" in extended, "phrase probe lost partition pruning on pfx"
