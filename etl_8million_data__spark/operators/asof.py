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
    # NULL timestamps never satisfy right_ts <= left_ts in the ranking
    # form; here a NULL-ts build row would sort FIRST (asc = nulls
    # first) and be carried by last(ignorenulls) as a bogus match, and a
    # NULL-ts probe could pick one up instead of being dropped — so
    # both are filtered before the union.
    right = right.filter(F.col(right_ts).isNotNull())
    left = left.filter(F.col(left_ts).isNotNull())
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


def interval_count_backward(
    probes: DataFrame,
    events: DataFrame,
    by: list[str],
    probe_ts: str,
    event_ts: str,
    probe_id: str,
    window_expr: str = "INTERVAL 1 HOUR",
    out_col: str = "n_in_window",
) -> DataFrame:
    """Count, for every probe row, the same-key event rows with
    ``probe_ts - window <= event_ts < probe_ts`` — the attribution /
    range-join aggregate — WITHOUT the per-key probe×event fan-out.

    Merge-sort formulation: count(events < t) is a running sum over the
    per-key (ts)-sorted union, so each probe becomes two signed bound
    rows (+count at t, -count at t - window) and the window count is
    their difference.  Cost per key partition: 2|P|+|E| rows and one
    sort, vs |P|×|E| joined rows in the naive range join — the plan
    that survives hot users at 100 TB.  At equal timestamps bound rows
    sort BEFORE event rows, which yields exactly the half-open
    ``[t - window, t)`` semantics of the equi+range-filter form.
    """
    # null keys never match in the equi+range-filter form, but LEFT
    # JOIN semantics keep the probe row with a 0 count — so null-key
    # probes are set aside here and unioned back with 0 at the end
    # (dropping them entirely would diverge from the left-join oracle);
    # null-key events can never contribute to any count and are dropped
    cond = None
    for k in by:
        isnull = F.col(k).isNull()
        cond = isnull if cond is None else (cond | isnull)
    null_probes = probes.filter(cond).select(
        F.col(probe_id), *by, F.lit(0).cast("bigint").alias(out_col)
    )
    probes = probes.na.drop(subset=by)
    events = events.na.drop(subset=by)
    hi = probes.select(
        *by,
        F.col(probe_ts).alias("_ts"),
        F.lit(0).alias("_is_event"),
        F.col(probe_id).alias("_pid"),
        F.lit(1).alias("_sign"),
    )
    lo = probes.select(
        *by,
        (F.col(probe_ts) - F.expr(window_expr)).alias("_ts"),
        F.lit(0).alias("_is_event"),
        F.col(probe_id).alias("_pid"),
        F.lit(-1).alias("_sign"),
    )
    ev = events.select(
        *by,
        F.col(event_ts).alias("_ts"),
        F.lit(1).alias("_is_event"),
        F.lit(None).cast(probes.schema[probe_id].dataType).alias("_pid"),
        F.lit(0).alias("_sign"),
    )
    u = hi.unionByName(lo).unionByName(ev)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_is_event").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.sum("_is_event").over(w)
    counted = (
        u.select(*by, "_is_event", "_pid", "_sign", cnt.alias("_cnt"))
        .filter(F.col("_is_event") == 0)
        .groupBy(F.col("_pid").alias(probe_id), *by)
        .agg(F.sum(F.col("_sign") * F.col("_cnt")).cast("bigint").alias(out_col))
    )
    return counted.unionByName(null_probes)
