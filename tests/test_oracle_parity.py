"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from etl_8million_data__spark.plans import all_queries
from tests.oracle import compare

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = _QUERIES[name]
    df = q.build(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    ok, msg = compare(df, q.oracle, sf_dir)
    assert ok, f"{name}: {msg}"
