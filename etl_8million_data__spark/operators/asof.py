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
