"""Query registry.

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame`` with
an optional DuckDB oracle SQL string over the same parquet tables.

Determinism contract (so order-insensitive value hashes match the
oracle exactly):
- aggregates over money-like doubles go through exact integer-cents
  arithmetic (``functions.exact``) — bit-identical in both engines;
- every top-k has a total-order tie-break;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[str, "Query"] = {}

# Submodules that register queries on import.
_MODULES = (
    "core",
    "analytics",
    "dedup",
    "text",
    "similarity",
    "multimodal",
    "timeseries",
    "pipeline_parity",
    "tpch_more",
    "tpch_wide",
    "custom_ops",
    "robustness",
    "approx",
    "behavioral",
    "corpus_ops",
)


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), doc or fn.__doc__ or "")
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(f"etl_8million_data__spark.plans.{mod}")
        except ModuleNotFoundError as e:
            # Allow partially-built library during development; only swallow
            # the *registry submodule itself* being absent.
            if f"plans.{mod}" not in str(e):
                raise


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _load()
    return _REGISTRY[name]
