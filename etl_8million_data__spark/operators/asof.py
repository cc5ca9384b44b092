"""As-of (point-in-time) join — an operator the reference lacks
(SURVEY.md §2.3 notes no range/as-of joins exist there) but any
time-series analytics surface needs.

Generic implementation: equi-join on the ``by`` keys, filter to
right.ts <= left.ts, keep the latest right row per left row via a
ranking window. Correct for any inputs.

Scale path: the equi-join fans out left×right per key before the
window cut. For 100 TB with high-frequency right sides, pre-bucket
both sides by key (co-located sort-merge join, no shuffle) and/or
pre-aggregate the right side to the last row per (key, time-bucket) so
the fan-out is bounded by buckets, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``by`` keys (inner:
    left rows with no match are dropped). ``right_tiebreak`` makes the
    pick deterministic when right_ts ties."""
    rcols = right_cols or [c for c in right.columns if c not in by]
    j = left.join(right, by, "inner").filter(F.col(right_ts) <= F.col(left_ts))
    order = [F.col(right_ts).desc()]
    if right_tiebreak:
        order.append(F.col(right_tiebreak).desc())
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(left_id, *by, left_ts, *rcols)
    )


def asof_join_backward_sorted(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Scale-path as-of join: union both sides tagged probe/build, sort
    once per ``by`` partition on (ts, side, tiebreak), and carry the
    last seen build row forward with ``last(..., ignorenulls)`` —
    the merge-sort formulation.  Identical semantics to
    :func:`asof_join_backward` (inclusive backward match, tiebreak-desc
    winner, inner), but NO left×right fan-out: each key partition holds
    |left|+|right| rows regardless of match multiplicity, so
    high-frequency right sides (quotes-per-event at 100 TB) cost one
    sort instead of a quadratic join."""
    rcols = right_cols or [c for c in right.columns if c not in by]
    lt_type = left.schema[left_ts].dataType
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.na.drop(subset=by).select(
        *by,
        F.col(right_ts).cast(lt_type).alias("_ts"),
        F.lit(1).alias("_is_right"),
        tb.alias("_tb"),
        # one struct per build row: `last(ignorenulls)` then picks whole
        # rows atomically — per-column lasts could stitch fields from
        # DIFFERENT right rows when some rcols are null.
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("_row"),
    )
    probe = left.na.drop(subset=by).select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.col(left_id).alias("_lid"),
    )
    u = probe.unionByName(r, allowMissingColumns=True)
    # Right rows sort BEFORE probe rows at equal ts (inclusive <=), and
    # among tied right rows the tiebreak-largest sorts last, so the
    # running `last` holds exactly the row the ranking form would pick.
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_right").desc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *by,
        "_ts",
        "_is_right",
        "_lid",
        F.last("_row", ignorenulls=True).over(w).alias("_m"),
    )
    return (
        filled.filter((F.col("_is_right") == 0) & F.col("_m").isNotNull())
        .select(
            F.col("_lid").alias(left_id),
            *by,
            F.col("_ts").alias(left_ts),
            *[F.col("_m").getField(c).alias(c) for c in rcols],
        )
    )
