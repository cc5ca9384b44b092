"""Incremental E2E capstone: JDBC bronze (skip-existing) -> run_all DAG
-> incremental near-dup dedup, run twice — the second batch must do
ONLY delta work at every stage:

1. the JDBC bronze insert skips keys already present (details.py-style
   main-loop increment);
2. the DAG's ingest fetches ONLY the new symbols (no re-fetch of the
   loaded universe);
3. the dedup increment probes the persisted band index (batch-only
   signature computation) and extends it append-only — batch-1 index
   files are byte-untouched after batch 2.
"""

from __future__ import annotations

import glob
import json
import os

from etl_8million_data__spark.operators.incremental_dedup import dedup_increment
from etl_8million_data__spark.pipelines.run import run_all
from etl_8million_data__spark.sources.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    write_jdbc_skip_existing,
)

_TEXTS = {
    "ACME": "acme corp builds widgets and ships them worldwide every single day",
    "BETA": "beta industries refines ore in large smelters near the coast line",
    "GAMA": "gamma logistics moves freight across three continents by rail and sea",
}


def _payload(sym: str) -> dict:
    return {
        "info": {"longName": f"{sym} Inc", "longBusinessSummary": _TEXTS[sym]},
        "cashflow": {
            "yearly": {"2024-12-31": {"Free Cash Flow": float(len(sym))}},
            "quarterly": {},
        },
    }


def _write_symbols_csv(path: str, symbols: list[str]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("Symbol\n")
        for s in symbols:
            f.write(f"{s}\n")


def _index_state(index_path: str) -> dict[str, float]:
    # bucketed layout: data files live under bucket=N/ partition dirs
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(
            os.path.join(index_path, "**", "*.parquet"), recursive=True
        )
    }


def test_incremental_e2e_second_batch_is_delta_only(spark, tmp_path):
    # --- stage 1: JDBC bronze, skip-existing increment -----------------
    url = f"jdbc:derby:{tmp_path}/bronze;create=true"

    def bronze_rows(symbols):
        return spark.createDataFrame(
            [(s, json.dumps(_payload(s))) for s in symbols],
            "symbol string, payload string",
        )

    n1 = write_jdbc_skip_existing(
        bronze_rows(["ACME", "BETA"]), url, "bronze", ["symbol"],
        driver=DERBY_EMBEDDED_DRIVER,
    )
    assert n1 == 2
    # batch 2 re-presents the universe plus one new symbol
    n2 = write_jdbc_skip_existing(
        bronze_rows(["ACME", "BETA", "GAMA"]), url, "bronze", ["symbol"],
        driver=DERBY_EMBEDDED_DRIVER,
    )
    assert n2 == 1  # only the delta crossed the wire

    # --- stage 2: the DAG, ingest fetches only unseen symbols ----------
    warehouse = str(tmp_path / "wh")
    csv = str(tmp_path / "symbols.csv")
    # fetch_fn runs EXECUTOR-side (rate-limited mapInPandas), so calls
    # are recorded as marker files, not an in-process list
    calls_dir = tmp_path / "fetch_calls"
    calls_dir.mkdir()

    def fetch(sym: str) -> dict:
        (calls_dir / sym).touch()
        return _payload(sym)

    def fetched() -> list[str]:
        return sorted(p.name for p in calls_dir.iterdir())

    _write_symbols_csv(csv, ["ACME", "BETA"])
    r1 = run_all(spark, csv, warehouse, fetch)
    assert fetched() == ["ACME", "BETA"] and r1["new_symbols"] == 2

    for p in calls_dir.iterdir():
        p.unlink()
    _write_symbols_csv(csv, ["ACME", "BETA", "GAMA"])
    r2 = run_all(spark, csv, warehouse, fetch)
    assert fetched() == ["GAMA"], "second run must fetch ONLY the delta"
    assert r2["new_symbols"] == 1
    assert r2["summary"] == 3  # dim reflects the full universe

    # --- stage 3: incremental dedup over the per-run delta docs --------
    idx = str(tmp_path / "band_index")
    docs1 = spark.createDataFrame(
        [(1, _TEXTS["ACME"]), (2, _TEXTS["BETA"])], "doc_id long, text string"
    )
    kept1 = dedup_increment(docs1, idx)
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]
    state1 = _index_state(idx)
    assert state1  # index materialized

    # batch 2 = the delta doc plus a re-crawl duplicate of batch 1
    docs2 = spark.createDataFrame(
        [(3, _TEXTS["GAMA"]), (4, _TEXTS["ACME"])], "doc_id long, text string"
    )
    kept2 = dedup_increment(docs2, idx)
    assert sorted(r.doc_id for r in kept2.collect()) == [3]

    # append-only delta: every batch-1 index file untouched (same mtime)
    state2 = _index_state(idx)
    for path, mtime in state1.items():
        assert state2.get(path) == mtime, f"batch-1 index file rewritten: {path}"
    assert len(state2) > len(state1)  # batch 2 appended its bands
