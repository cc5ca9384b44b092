"""JDBC adapter round-trip against embedded Derby (bundled with Spark —
no external DB in the sandbox; the adapter itself is dialect-agnostic).

Mirrors the reference bronze-store lifecycle (details.py:177-238):
create-on-first-write, append, distinct-key read-back, skip-existing
increment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_8million_data__spark.sources.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    existing_keys,
    read_jdbc,
    write_jdbc_append,
    write_jdbc_skip_existing,
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Fresh embedded-Derby DB, seeded with two bronze rows so each test
    stands alone (create-on-first-write parity, details.py:191-204)."""
    d = tmp_path_factory.mktemp("derby")
    url = f"jdbc:derby:{d}/bronze;create=true"
    seed = _payload_rows(
        spark, [("ACME", '{"info":{}}', None), ("BETA", '{"info":{}}', None)]
    )
    write_jdbc_append(seed, url, "payloads", driver=DERBY_EMBEDDED_DRIVER, num_partitions=1)
    return url


def _payload_rows(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, payload string, loaded_at timestamp"
    )


def test_jdbc_append_and_read_roundtrip(spark, derby_url):
    back = read_jdbc(spark, derby_url, "payloads", driver=DERBY_EMBEDDED_DRIVER)
    assert sorted(r["symbol"] for r in back.collect()) == ["ACME", "BETA"]


def test_jdbc_skip_existing_increment(spark, derby_url):
    # second load: one duplicate symbol, one new -> only the new row lands
    inc = _payload_rows(
        spark,
        [
            ("ACME", '{"info":{"v":2}}', None),  # already present -> skipped
            ("GAMMA", '{"info":{}}', None),
        ],
    )
    n = write_jdbc_skip_existing(
        inc, derby_url, "payloads", ["symbol"],
        driver=DERBY_EMBEDDED_DRIVER, num_partitions=1,
    )
    assert n == 1
    back = read_jdbc(spark, derby_url, "payloads", driver=DERBY_EMBEDDED_DRIVER)
    got = sorted(r["symbol"] for r in back.collect())
    assert got == ["ACME", "BETA", "GAMMA"]
    # idempotence: a full replay appends nothing
    assert (
        write_jdbc_skip_existing(
            inc, derby_url, "payloads", ["symbol"],
            driver=DERBY_EMBEDDED_DRIVER, num_partitions=1,
        )
        == 0
    )
    keys = existing_keys(spark, derby_url, "payloads", ["symbol"], driver=DERBY_EMBEDDED_DRIVER)
    assert keys.count() == 3


def test_jdbc_predicate_partitioned_read(spark, derby_url):
    """predicates -> one remote scan per predicate (parallel read path).

    The predicates path is raw SQL end-to-end (legacy jdbc API): Spark's
    DDL quotes COLUMN identifiers (case-preserved) but passes the table
    name raw (case-folded by the engine) — predicates must quote columns
    to match."""
    back = read_jdbc(
        spark,
        derby_url,
        "payloads",
        driver=DERBY_EMBEDDED_DRIVER,
        # Derby maps StringType -> CLOB, which is not <-comparable: raw
        # predicates must cast. (MySQL/Postgres VARCHARs need no cast.)
        predicates=[
            'CAST("symbol" AS VARCHAR(64)) < \'C\'',
            'CAST("symbol" AS VARCHAR(64)) >= \'C\'',
        ],
    )
    assert back.rdd.getNumPartitions() == 2
    expected = read_jdbc(spark, derby_url, "payloads", driver=DERBY_EMBEDDED_DRIVER).count()
    assert back.count() == expected >= 2


def test_jdbc_filter_pushdown_plan(spark, derby_url):
    """The dialect must see the filter (PushedFilters), not Spark."""
    back = read_jdbc(spark, derby_url, "payloads", driver=DERBY_EMBEDDED_DRIVER)
    plan = back.filter(F.col("symbol") == "ACME")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "symbol" in plan


@pytest.mark.skipif(
    "MYSQL_JDBC_URL" not in __import__("os").environ,
    reason="no live MySQL in the sandbox; set MYSQL_JDBC_URL "
    "(e.g. jdbc:mysql://host:3306/db?user=u&password=p) and put the "
    "Connector/J jar on spark.jars to run the dialect smoke",
)
def test_jdbc_mysql_dialect_smoke(spark, tmp_path):
    """Same bronze lifecycle as the Derby tests, against the reference's
    actual store dialect (details.py:177-238 targets MySQL 8): append,
    pruned key read-back, skip-existing increment, and the SQLState
    42S02 first-write path. Env-guarded — the sandbox has no MySQL; on
    a deployment with one this verifies the type mapping end-to-end."""
    import os
    import uuid

    url = os.environ["MYSQL_JDBC_URL"]
    table = f"payloads_smoke_{uuid.uuid4().hex[:8]}"
    seed = _payload_rows(spark, [("ACME", '{"info":{}}', None)])
    # first write goes through the SQLState-classified missing-table path
    assert write_jdbc_skip_existing(seed, url, table, ["symbol"], num_partitions=1) == 1
    inc = _payload_rows(spark, [("ACME", "{}", None), ("BETA", "{}", None)])
    assert write_jdbc_skip_existing(inc, url, table, ["symbol"], num_partitions=1) == 1
    keys = existing_keys(spark, url, table, ["symbol"])
    assert sorted(r["symbol"] for r in keys.collect()) == ["ACME", "BETA"]
