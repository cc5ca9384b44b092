"""Grouped-map custom operator (applyInPandas, batch form).

Per-user value trend: least-squares slope of value over time. Computed
with *integer* sums (seconds since the user's first event × cents) so
the closed-form slope is bit-deterministic and oracle-checkable:

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)        [exact ints]

This is the batch applyInPandas slot of SURVEY §2.11 (the streaming
slot is streaming/stateful.py). The pandas step only sees one user's
rows at a time — Arrow-batched, grouped by the shuffle, memory bounded
by the largest group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

TREND_SCHEMA = "user_id long, n_events long, slope_cents_per_hour double"


def _trend(pdf: pd.DataFrame) -> pd.DataFrame:
    uid = int(pdf["user_id"].iloc[0])
    # integer domain: seconds from the user's first event, value cents
    ts = pdf["ts"].astype("int64") // 1_000_000_000  # ns -> s
    x = (ts - ts.min()).astype("int64")
    y = (pdf["value"] * 100).round().astype("int64")
    n = len(pdf)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    denom = n * sxx - sx * sx
    # cents/sec -> cents/hour; denom 0 when all events share a timestamp
    slope = float(n * sxy - sx * sy) / denom * 3600.0 if denom else None
    return pd.DataFrame({"user_id": [uid], "n_events": [n], "slope_cents_per_hour": [slope]})


def user_value_trend(events: DataFrame) -> DataFrame:
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        _trend, TREND_SCHEMA
    )
