"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §7.2(4): the 'custom stateful operators' slot).

Operator: per-user running EMA (exponential moving average) of event
values + running count — order-dependent state that no built-in
windowed aggregation expresses. State is one (count, ema) pair per
user; idle users are evicted by processing-time timeout so state stays
bounded (the 100 TB concern for any stateful stream).

The batch twin (an array fold over the time-ordered values) is the
oracle-checked query ``events_user_ema`` in plans/timeseries.py; the
test asserts stream == batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EMA_ALPHA = 0.1

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("ema_value", DoubleType())]
)


def _make_update_fn(evict_idle: bool):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if evict_idle and state.hasTimedOut:
            state.remove()
            return
        n, ema = state.get if state.exists else (0, None)
        rows = pd.concat(list(pdfs))
        # state folds must be deterministic: order by event time then id
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"]:
            v = float(v)
            ema = v if ema is None else EMA_ALPHA * v + (1.0 - EMA_ALPHA) * ema
            n += 1
        state.update((n, ema))
        if evict_idle:
            state.setTimeoutDuration(3600 * 1000)  # evict users idle > 1h
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ema_value": [ema]})

    return update


def user_ema_stream(events: DataFrame, evict_idle: bool = False) -> DataFrame:
    """events stream -> one (user_id, n_events, ema_value) row per user
    per micro-batch (update semantics).

    ``evict_idle=True`` turns on ProcessingTimeTimeout state eviction —
    required on a real 24/7 stream to bound state, but it keeps the
    query scheduling timeout-handling batches, so availableNow replays
    (tests/backfills) never self-terminate: leave it off there.
    """
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(evict_idle),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
            if evict_idle
            else GroupStateTimeout.NoTimeout,
        )
    )
