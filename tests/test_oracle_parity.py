"""Every registered query with an oracle must match DuckDB exactly —
at sf0.001 AND at sf0.01, the scale the external driver gates at, so
scale-dependent divergence (overflow, skew, tie-breaks) is caught
before the driver sees it.  The comparator (tests/oracle.py) is
type-strict: DuckDB results come through Arrow, so HUGEINT/DECIMAL
widening fails locally exactly like the driver's value hash."""

from __future__ import annotations

import os

import pytest

from etl_8million_data__spark.plans import all_queries

_QUERIES = all_queries()
_SCALES = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
] or [os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")]


@pytest.mark.parametrize("scale_dir", _SCALES, ids=[os.path.basename(d) for d in _SCALES])
@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, scale_dir, name):
    from tests.oracle import compare

    q = _QUERIES[name]
    df = q.build(spark, scale_dir)
    assert df.columns, f"{name}: no columns"
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    ok, msg = compare(df, q.oracle, scale_dir)
    assert ok, f"{name}: {msg}"
