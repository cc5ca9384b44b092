"""BPE tokenizer-vocabulary induction as a relational plan.

The canonical tokenizer-training step of an LLM data pipeline: start
from the corpus word vocabulary with counts, represent each word as a
space-joined character sequence, and repeatedly merge the globally
most frequent adjacent symbol pair (classic word-level BPE a la
Sennrich et al., learned on the VOCABULARY weighted by corpus counts —
so each round costs O(|vocab|), not O(corpus)).

Determinism/portability contract (DuckDB oracle mirrors every step):
- the winning pair per round is argmin of the struct (-count, pair) —
  i.e. highest weighted count, ties broken by the lexicographically
  smallest pair (ASCII symbols, so binary == lexicographic order);
- merge application is a GREEDY LEFT-TO-RIGHT fold over the symbol
  array (state machine carrying one pending symbol), identical in both
  engines — NOT a string replace(), whose non-overlapping scan
  diverges from greedy BPE on runs like 'a a a a';
- counts are exact integers end to end.

Scale shape: each round is one vocabulary-sized pair aggregation plus
a broadcast of the single winning rule; the driver loop carries
CONTROL only (round index), never row data — the vocabulary frame is
localCheckpoint'ed per round exactly like the k-means training loop
(at petabyte scale you'd land it in a temp table instead). Simplified
vs production BPE: no end-of-word marker, no byte fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US = "\x1f"


def char_seq(token: Column) -> Column:
    """'key' -> 'k e y' (space-joined character symbols)."""
    return F.trim(F.regexp_replace(token, "(.)", "$1 "))


def apply_merge(seq: Column, pair: Column) -> Column:
    """Greedy left-to-right application of one merge rule to a
    space-joined symbol sequence; identity when ``pair`` is NULL.

    Fold state is the string 'out<US>prev': ``out`` is the emitted
    sequence so far, ``prev`` the one pending symbol. A step either
    consumes (prev, x) as the merged pair or flushes prev and pends x;
    the finisher flushes the last pending symbol by turning the <US>
    into a space. Mirrored token-for-token by the oracle's list_reduce.
    """
    a_sym = F.split(pair, " ").getItem(0)
    b_sym = F.split(pair, " ").getItem(1)
    merged = F.replace(pair, F.lit(" "), F.lit(""))

    def step(acc: Column, x: Column) -> Column:
        out = F.substring_index(acc, _US, 1)
        prev = F.substring_index(acc, _US, -1)
        return F.when(
            pair.isNotNull() & (prev == a_sym) & (x == b_sym),
            F.concat(out, F.lit(" "), merged, F.lit(_US)),
        ).otherwise(
            F.concat(
                out,
                F.when(prev == "", F.lit("")).otherwise(F.concat(F.lit(" "), prev)),
                F.lit(_US),
                x,
            )
        )

    folded = F.aggregate(F.split(seq, " "), F.lit(_US), step)
    return F.trim(F.replace(folded, F.lit(_US), F.lit(" ")))


def adjacent_pairs(seq: Column) -> Column:
    """Array of adjacent symbol pairs ('a b') of a space-joined seq."""
    s = F.split(seq, " ")
    n = F.size(s)
    return F.zip_with(
        F.slice(s, 1, n - 1), F.slice(s, 2, n - 1), lambda x, y: F.concat_ws(" ", x, y)
    )


def bpe_train(
    vocab: DataFrame, n_merges: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from a (token, cnt) vocabulary.

    Returns ``(merges, segmented)``: the ordered merge table
    (merge_no, pair, merged, weight) — the tokenizer artifact — and the
    final per-word segmentation (token, cnt, seq, n_symbols). Rounds
    whose vocabulary has no adjacent pair left produce no merge row.
    """
    spark = vocab.sparkSession
    v = vocab.select("token", "cnt", char_seq(F.col("token")).alias("seq"))
    v = v.localCheckpoint(eager=True)

    merge_rows = []
    for r in range(1, n_merges + 1):
        pairs = v.select(
            F.explode(adjacent_pairs(F.col("seq"))).alias("pair"), "cnt"
        ).groupBy("pair").agg(F.sum("cnt").alias("c"))
        # argmax with total order: highest count, then smallest pair.
        top = pairs.agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("pair").alias("p"))).alias(
                "m"
            )
        )
        rule = top.select(
            F.lit(r).alias("merge_no"),
            F.col("m.p").alias("pair"),
            F.replace(F.col("m.p"), F.lit(" "), F.lit("")).alias("merged"),
            (-F.col("m.nc")).alias("weight"),
        ).localCheckpoint(eager=True)
        merge_rows.append(rule)
        v = (
            v.crossJoin(F.broadcast(rule.select(F.col("pair").alias("_mp"))))
            .select(
                "token",
                "cnt",
                apply_merge(F.col("seq"), F.col("_mp")).alias("seq"),
            )
            .localCheckpoint(eager=True)
        )

    merges = merge_rows[0]
    for m in merge_rows[1:]:
        merges = merges.unionByName(m)
    merges = merges.filter(F.col("pair").isNotNull())
    segmented = v.select(
        "token", "cnt", "seq", F.size(F.split(F.col("seq"), " ")).alias("n_symbols")
    )
    return merges, segmented
