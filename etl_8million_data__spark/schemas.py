"""Typed schemas for the five reference tables (SURVEY.md §1) plus the
nested payload document.

Key modeling decision (SURVEY.md §1.2): dates and metric names inside a
payload are *open sets* (yfinance adds/renames freely), so the two
inner levels are MapType, not StructType; ``info`` values are
mixed-type in the source JSON and land as MapType(String,String) with
downstream casts (the curated projection happens in pipelines/).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# stocks_full.csv:1 (symbol,company,industry,market_cap); written main.py:311-319
STOCKS_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), True),
        StructField("company", StringType(), True),
        StructField("industry", StringType(), True),
        StructField("market_cap", StringType(), True),  # raw suffixed string, never parsed upstream
    ]
)

# statement folders in the payload (details.py:139-153); folder->code map Financilas.py:78
STATEMENT_FOLDERS = {"cashflow": "CF", "incomestatement": "IS", "balancesheet": "BS"}
FREQS = ("yearly", "quarterly")

_STMT = StructType(
    [
        StructField("yearly", MapType(StringType(), MapType(StringType(), DoubleType())), True),
        StructField(
            "quarterly", MapType(StringType(), MapType(StringType(), DoubleType())), True
        ),
    ]
)

# payload shape per details.py:139-153: {info:{...}, cashflow:{yearly:{date->{metric->val}}, ...}, ...}
PAYLOAD_SCHEMA = StructType(
    [
        StructField("info", MapType(StringType(), StringType()), True),
        StructField("cashflow", _STMT, True),
        StructField("balancesheet", _STMT, True),
        StructField("incomestatement", _STMT, True),
    ]
)

# raw/bronze JSON store, DDL details.py:192-201
RAW_PAYLOADS_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),  # surrogate (BIGINT AUTO_INCREMENT), never queried
        StructField("symbol", StringType(), False),
        StructField("payload", StringType(), True),  # JSON text
        StructField("loaded_at", TimestampType(), True),  # naive UTC (details.py:39-44)
    ]
)

# long/EAV fact, DDL Financilas.py:16-30; PK (stock, statement_type, metric, date)
FINANCIALS_SCHEMA = StructType(
    [
        StructField("stock", StringType(), False),
        StructField("yf_name", StringType(), True),
        StructField("statement_type", StringType(), True),  # CF | IS | BS
        StructField("metric", StringType(), False),
        StructField("stockcurrency", StringType(), True),
        StructField("financialcurrency", StringType(), True),
        StructField("calendar_year", IntegerType(), True),
        StructField("period", IntegerType(), True),  # 1-3 quarter, 4 == yearly (Financilas.py:94)
        StructField("value", DoubleType(), True),
        StructField("date", DateType(), False),
    ]
)

FINANCIALS_KEYS = ["stock", "statement_type", "metric", "date"]

# profile dimension, DDL Summary.py:17-35; PK (stock)
SUMMARY_SCHEMA = StructType(
    [
        StructField("stock", StringType(), False),
        StructField("yf_name", StringType(), True),
        StructField("long_summary", StringType(), True),  # MEDIUMTEXT, capped 200k (Summary.py:115)
        StructField("sector", StringType(), True),
        StructField("industry", StringType(), True),
        StructField("website", StringType(), True),
        StructField("employees", IntegerType(), True),
        StructField("city", StringType(), True),
        StructField("state", StringType(), True),
        StructField("country", StringType(), True),
        StructField("currency", StringType(), True),
        StructField("founded_year", IntegerType(), True),
        StructField("former_name", StringType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)
