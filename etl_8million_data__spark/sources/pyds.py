"""Python Data Source API (Spark 4): the REST/yfinance-style source as
a first-class ``spark.read.format("symbol_fixture")`` reader.

Where ``sources/fetch.py`` adapts an existing symbol DataFrame via
mapInPandas, this registers a proper pluggable source: the engine asks
the source for partitions (symbol chunks) and each executor reads its
chunk independently — the natural shape for a paged/partitioned API
crawl (per-partition connections, retries, and rate limits; adding
symbols only adds partitions, never driver work).

The fixture implementation generates deterministic payloads (no
network in this environment); a real deployment swaps ``_fetch_one``
for an HTTP call and keeps every Spark-facing part unchanged.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "symbol string, payload string, loaded_at string"


def _fetch_one(symbol: str) -> dict:
    """Deterministic fixture payload in the reference's bronze shape
    (details.py:139-153): info + per-statement yearly/quarterly maps."""
    seed = sum(ord(c) for c in symbol)
    # distinct period-end dates per frequency: the fact PK is
    # (stock, statement_type, metric, date) — no freq — so colliding
    # dates across freqs would (correctly) collapse in the upsert
    ends = {"yearly": "12-31", "quarterly": "03-31"}
    stmt = {
        freq: {
            f"{2022 + i}-{end}": {
                f"metric_{m}": float(seed * 100 + i * 10 + m) for m in range(3)
            }
            for i in range(2)
        }
        for freq, end in ends.items()
    }
    return {
        "info": {"longName": f"Name {symbol}", "currency": "USD",
                 "financialCurrency": "USD"},
        "cashflow": stmt,
        "balancesheet": stmt,
        "incomestatement": stmt,
    }


class _SymbolPartition(InputPartition):
    def __init__(self, symbols: Sequence[str]):
        self.symbols = list(symbols)


class SymbolFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = [
            s for s in (options.get("symbols") or "").split(",") if s.strip()
        ]
        self.n_parts = int(options.get("numpartitions") or 4)

    def partitions(self) -> list[InputPartition]:
        n = max(1, min(self.n_parts, len(self.symbols) or 1))
        chunks = [self.symbols[i::n] for i in range(n)]
        return [_SymbolPartition(c) for c in chunks if c]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        for sym in partition.symbols:
            try:
                payload = _fetch_one(sym)
            except Exception as exc:  # per-record quarantine, never fail
                payload = {"_error": str(exc)}
            yield (
                sym,
                json.dumps(payload, ensure_ascii=False),
                "2025-08-15 09:23:00",
            )


class SymbolFixtureDataSource(DataSource):
    """Usage::

        spark.dataSource.register(SymbolFixtureDataSource)
        df = (spark.read.format("symbol_fixture")
              .option("symbols", "AAPL,MSFT").load())
    """

    @classmethod
    def name(cls) -> str:
        return "symbol_fixture"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SymbolFixtureReader:
        return SymbolFixtureReader(self.options)
