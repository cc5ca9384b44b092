"""REST-API source adapter shape (SURVEY.md §2.1: yfinance fetch,
details.py:129-154).

In-engine parity is the *shape*: a DataFrame of symbols goes in, a
DataFrame of (symbol, payload JSON, loaded_at) comes out, fetched
per-partition with client-side rate limiting and per-record error
quarantine ({"_error": ...} payload sentinel, details.py:136-137).
Tests and fixtures inject a deterministic ``fetch_fn``; a real
deployment would wrap the HTTP client the same way.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def fetch_payloads(
    symbols: DataFrame,
    fetch_fn: Callable[[str], dict],
    rate_limit_sleep: float = 0.0,
) -> DataFrame:
    """mapInPandas over the symbol frame: each partition fetches its
    symbols sequentially with an optional sleep (the reference's
    SLEEP_SECONDS_BETWEEN_CALLS=1.0, details.py:27,293 — here the
    limiter is per executor-slot, so cluster-wide QPS = slots/sleep).

    Errors never fail the job: the payload becomes {"_error": msg}
    (details.py:136-137) and flows to the sink for later inspection.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for sym in pdf["symbol"]:
                try:
                    payload = fetch_fn(sym)
                except Exception as exc:  # per-record quarantine
                    payload = {"_error": str(exc)}
                payloads.append(json.dumps(payload, ensure_ascii=False))
                if rate_limit_sleep:
                    time.sleep(rate_limit_sleep)
            yield pd.DataFrame({"symbol": pdf["symbol"], "payload": payloads})

    return symbols.select("symbol").mapInPandas(fn, "symbol string, payload string")
