"""Every registered query with an oracle must match DuckDB exactly —
at sf0.001 AND at sf0.01, the scale the external driver gates at, so
scale-dependent divergence (overflow, skew, tie-breaks) is caught
before the driver sees it.  The comparator (tests/oracle.py) is
type-strict: DuckDB results come through Arrow, so HUGEINT/DECIMAL
widening fails locally exactly like the driver's value hash.

Wall-time design (round-8): the sweep is ~430 (query, scale) cells and
used to run serially inside one session-scoped SparkSession, costing
~17 of the suite's 20 minutes.  SparkSession job submission is
thread-safe, so the session fixture below runs the whole sweep through
a thread pool (default 8 workers — Spark's scheduler interleaves the
collect stages across the 8 local cores) and caches per-cell results;
the parametrized tests then assert the cached verdicts, keeping one
pytest node per (query, scale) for failure granularity.  The single
query that registers shared-name temp views (tag ``sql-api``) holds a
lock across build+execute so concurrent scales can't cross-resolve
views.  Set ``SPARK_GRAFT_PARITY_WORKERS=1`` to restore the serial
order when debugging.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor, as_completed

import pytest

from etl_8million_data__spark.plans import all_queries

_QUERIES = all_queries()
_SCALES = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
] or [os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")]

# Queries that resolve shared-name temp views during build: serialize
# build+execute so two scales can't race on the view registration.
_VIEW_LOCK = threading.Lock()


def _needs_view_lock(q) -> bool:
    return "sql-api" in getattr(q, "tags", ())


def _run_cell(spark, name: str, scale_dir: str) -> tuple[bool, str]:
    from tests.oracle import compare

    q = _QUERIES[name]
    try:
        if q.oracle is None:
            df = q.build(spark, scale_dir)
            if not df.columns:
                return False, "no columns"
            # rows-only check, mirroring the driver's weaker gate
            return (df.count() >= 0), "rows-only ok"
        if _needs_view_lock(q):
            with _VIEW_LOCK:
                df = q.build(spark, scale_dir)
                if not df.columns:
                    return False, "no columns"
                return compare(df, q.oracle, scale_dir)
        df = q.build(spark, scale_dir)
        if not df.columns:
            return False, "no columns"
        return compare(df, q.oracle, scale_dir)
    except Exception as e:  # surface the worker exception per-cell
        return False, f"exception: {e!r}"


@pytest.fixture(scope="session")
def parity_results(spark) -> dict[tuple[str, str], tuple[bool, str]]:
    workers = int(os.environ.get("SPARK_GRAFT_PARITY_WORKERS", "8"))
    cells = [(n, d) for d in _SCALES for n in sorted(_QUERIES)]
    results: dict[tuple[str, str], tuple[bool, str]] = {}
    if workers <= 1:
        for n, d in cells:
            results[(n, d)] = _run_cell(spark, n, d)
        return results
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = {ex.submit(_run_cell, spark, n, d): (n, d) for n, d in cells}
        for f in as_completed(futs):
            results[futs[f]] = f.result()
    return results


@pytest.mark.parity
@pytest.mark.parametrize("scale_dir", _SCALES, ids=[os.path.basename(d) for d in _SCALES])
@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(parity_results, scale_dir, name):
    ok, msg = parity_results[(name, scale_dir)]
    assert ok, f"{name}@{os.path.basename(scale_dir)}: {msg}"
