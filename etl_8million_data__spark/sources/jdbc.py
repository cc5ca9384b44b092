"""JDBC source/sink adapter (reference: details.py:177-238 MySQL store).

The reference keeps its bronze layer in MySQL: `ensure_table` DDL,
per-symbol committed INSERTs (details.py:206-228), and
`get_existing_symbols` for skip-existing increments (details.py:231-238).
Parquet is this repo's canonical store (SURVEY.md §2.1); this module is
the boundary adapter for deployments where the bronze/raw layer really
lives behind JDBC.

Scale design (100 TB / 1000-executor notes):

- **Reads parallelize only if told how.** A bare ``spark.read.jdbc`` is
  ONE connection on one executor. `read_jdbc` exposes
  ``partition_column/lower_bound/upper_bound/num_partitions`` (range
  split, the `id BIGINT AUTO_INCREMENT` PK of details.py:194 is the
  natural choice) and ``predicates`` (one scan per predicate) so the
  scan fans out. ``fetchsize`` keeps the cursor streaming instead of
  buffering whole result sets.
- **Let the dialect generate SQL.** Column pruning and filter pushdown
  reach the remote engine through Spark's JdbcDialect (quoted
  identifiers per-DB — raw hand-built subqueries break on e.g. Derby's
  case folding). `existing_keys` is therefore ``.select(keys).distinct()``
  on the JDBC relation: the remote engine sees only the key columns.
- **Writes bound DB fan-in.** ``num_partitions`` caps concurrent
  connections (a 1000-task append is a self-inflicted DoS on the DB);
  ``batchsize`` batches the INSERT round-trips the reference paid
  per-row.
- **Upsert semantics** (ON DUPLICATE KEY, Financilas.py:169-186) are not
  portable through the plain JDBC writer; the reference's *actual*
  incremental pattern — skip symbols already present, insert the rest
  (main-loop of details.py) — is `write_jdbc_skip_existing`: left-anti
  against `existing_keys`, then append.

Dialect coverage note: tests exercise this adapter against embedded
Derby (the only JDBC engine in the sandbox; bundled with Spark). The
semantics asserted — ranged parallel reads, pruned key read-back,
batched append, skip-existing, create-on-first-write — go through
Spark's JdbcDialect layer and are dialect-independent, but a MySQL 8
type-mapping quirk (the reference's actual store, details.py:200)
would only surface against a live MySQL; point the tests at one via a
real URL + driver jar when available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"  # bundled with Spark

# SQLStates meaning "table/view does not exist", per dialect:
# Derby 42X05, MySQL/SQLServer 42S02, Postgres 42P01, DB2 42704.
_TABLE_MISSING_SQLSTATES = frozenset({"42X05", "42S02", "42P01", "42704"})


def _is_table_missing(exc: Exception) -> bool:
    """True iff the Java cause chain carries a table-not-found SQLState.

    Message-substring matching is unsafe ("Schema X does not exist",
    missing functions, …); the SQLState on the underlying
    java.sql.SQLException is the dialect's own classification.
    """
    je = getattr(exc, "java_exception", None)
    while je is not None:
        try:
            state = je.getSQLState()
        except Exception:
            state = None
        if state in _TABLE_MISSING_SQLSTATES:
            return True
        je = je.getCause()
    return False


def _options(url: str, table: str, driver: str | None, extra: dict | None) -> dict:
    opts = {"url": url, "dbtable": table}
    if driver:
        opts["driver"] = driver
    opts.update(extra or {})
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    fetch_size: int = 10_000,
    options: dict | None = None,
) -> DataFrame:
    """Parallel JDBC scan. ``partition_column`` + bounds split the table
    into ``num_partitions`` range predicates (one connection each);
    ``predicates`` is the explicit alternative for non-numeric splits."""
    if predicates is not None:
        props = {"driver": driver} if driver else {}
        props["fetchsize"] = str(fetch_size)
        props.update({k: str(v) for k, v in (options or {}).items()})
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    reader = spark.read.format("jdbc").options(
        **_options(url, table, driver, options), fetchsize=fetch_size
    )
    if partition_column is not None:
        reader = reader.options(
            partitionColumn=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or 8,
        )
    return reader.load()


def existing_keys(
    spark: SparkSession,
    url: str,
    table: str,
    key_cols: list[str],
    *,
    driver: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Distinct key set already in the remote table
    (get_existing_symbols parity, details.py:231-238). Column pruning
    pushes to the remote scan; only key columns cross the wire."""
    return (
        read_jdbc(spark, url, table, driver=driver, options=options)
        .select(*key_cols)
        .distinct()
    )


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    options: dict | None = None,
) -> None:
    """Batched append (vs the reference's one-commit-per-symbol loop,
    details.py:206-228). ``num_partitions`` caps concurrent DB
    connections — always set it on a large cluster."""
    out = df.coalesce(num_partitions) if num_partitions else df
    (
        out.write.format("jdbc")
        .options(**_options(url, table, driver, options), batchsize=batch_size)
        .mode("append")
        .save()
    )


def write_jdbc_skip_existing(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    *,
    driver: str | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    options: dict | None = None,
) -> int:
    """Incremental load: insert only rows whose key is not already
    present (the main-loop skip of details.py). Left-anti against the
    (pruned, distinct) remote key set — no read-back of payload columns.
    Returns the number of rows appended.

    Not a concurrent-writer-safe upsert: like the reference, the guard
    is read-then-insert. Last-writer-wins merge semantics live in
    operators/upsert.py on the canonical store.

    First-write-safe (ensure_table parity, details.py:191-204): when
    the table doesn't exist yet, every row is fresh and the append
    creates it. Only a missing-table error is treated that way — any
    other read failure propagates (silently treating a broken read as
    empty would re-insert the whole universe).
    """
    try:
        # JDBC schema resolution happens at load() — a missing table
        # fails HERE, before any anti-join/count work, so the catch is
        # scoped to this call alone.
        keys = existing_keys(
            df.sparkSession, url, table, key_cols, driver=driver, options=options
        )
    except Exception as e:  # first write: table not created yet
        if not _is_table_missing(e):
            # Classified by the dialect's SQLState, not message text —
            # "Schema … does not exist" or a network failure must NOT be
            # treated as an empty table (would re-insert every row).
            raise
        fresh, n = df, df.count()
    else:
        fresh = df.join(keys, on=key_cols, how="left_anti")
        # localCheckpoint would be overkill: the anti-join re-reads only
        # the key projection if the plan is re-executed by the writer.
        n = fresh.count()
    if n:
        write_jdbc_append(
            fresh, url, table,
            driver=driver, batch_size=batch_size,
            num_partitions=num_partitions, options=options,
        )
    return n
