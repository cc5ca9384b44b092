"""End-to-end pipeline driver: the reference's five imperative scripts
as one three-step DAG (SURVEY.md §3.4) — ingest (CSV -> bronze payload
store) then fan out to the fact / dimension / quote builders, all from
ONE read of the bronze snapshot.

This is the only driver-side control flow the rebuild keeps: stage
ordering. Everything inside a stage is a declarative plan; re-running
the whole DAG is idempotent (incremental anti-join skips loaded
symbols, keyed upserts are last-writer-wins).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import SparkSession

from etl_8million_data__spark.pipelines.financials import build_financials_fact
from etl_8million_data__spark.pipelines.ingest import ingest
from etl_8million_data__spark.pipelines.quotes import quote_snapshot
from etl_8million_data__spark.pipelines.summary import build_summary_dim


def run_all(
    spark: SparkSession,
    symbols_csv: str,
    warehouse: str,
    fetch_fn: Callable[[str], dict],
    quote_head: int | None = 2,
) -> dict[str, int]:
    """Run ingest -> financials fact -> summary dim -> quote snapshot
    under ``warehouse``; returns row counts per table. ``quote_head``
    mirrors the reference's first-N-symbols quote slice (pyc
    load_symbols head(2)); None quotes every symbol."""
    bronze = os.path.join(warehouse, "yahoo_financials")
    fact_path = os.path.join(warehouse, "financials")
    dim_path = os.path.join(warehouse, "summary")
    quotes_path = os.path.join(warehouse, "yahoo_finance_csv")

    n_new = ingest(spark, symbols_csv, bronze, fetch_fn)
    raw = spark.read.parquet(bronze)

    build_financials_fact(raw, fact_path)
    build_summary_dim(raw, dim_path)

    q_src = raw.orderBy("symbol").limit(quote_head) if quote_head else raw
    quote_snapshot(q_src).coalesce(1).write.mode("overwrite").csv(
        quotes_path, header=True
    )

    return {
        "new_symbols": n_new,
        "financials": spark.read.parquet(fact_path).count(),
        "summary": spark.read.parquet(dim_path).count(),
        "quotes": spark.read.option("header", True).csv(quotes_path).count(),
    }
