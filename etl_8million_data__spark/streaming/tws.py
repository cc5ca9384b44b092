"""Per-user EMA as a Spark 4 ``transformWithStateInPandas`` stateful
processor — the successor API to ``applyInPandasWithState`` (which
implements the same operator in streaming/stateful.py). Both exist so
the engine demonstrates the old and new custom-stateful surfaces over
identical semantics; the batch oracle twin is ``events_user_ema``.

The new API's wins at 100 TB: composable typed state handles (value /
list / map state instead of one monolithic tuple), explicit timers in
processing or event time, and a state store that must be RocksDB-backed
(changelog-checkpointable, so state size is bounded by disk not heap).

Runtime requirement: the transformWithState protocol speaks protobuf to
a per-query Python driver worker, so the ``protobuf`` package must be
installed; environments without it (like this test container) keep the
old-API operator as the executable path and the matching test skips.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from etl_8million_data__spark.streaming.stateful import (
    EMA_ALPHA,
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserEmaProcessor(StatefulProcessor):
    """ValueState[(n_events, ema)] per user; same deterministic fold
    (time-then-id order within the batch) as the old-API operator."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ema_state", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        n, ema = self._state.get() if self._state.exists() else (0, None)
        pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            v = float(v)
            ema = v if ema is None else EMA_ALPHA * v + (1.0 - EMA_ALPHA) * ema
            n += 1
        self._state.update((n, ema))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ema_value": [ema]}
        )

    def close(self) -> None:
        pass


def user_ema_tws_stream(events: DataFrame) -> DataFrame:
    """events stream -> per-user (n_events, ema_value), update mode.

    Requires ``spark.sql.streaming.stateStore.providerClass`` set to
    RocksDB (``ROCKSDB_PROVIDER``) before the query starts — the new
    API refuses HDFS-backed state by design.
    """
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserEmaProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
