"""Symbol-universe sources (SURVEY.md §2.1).

The reference gets its universe from a Selenium scrape (main.py:25-316)
and reads it back from CSV (details.py:260). The scrape itself is an
out-of-engine I/O adapter; in-engine parity is (a) the CSV scan with
runtime column sniffing and (b) the cleaning pipeline
(strip / ''->NULL / dropna / dedup, details.py:262-271 + main.py:313).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.functions.scalars import clean_str

# column-name sniffing candidates (Financilas.py:113-133, Summary.py:50-66,
# details.py:47-51)
SYMBOL_CANDIDATES = ("symbol", "stock", "ticker", "SYMBOL", "TICKER", "Symbol", "Ticker")
PAYLOAD_CANDIDATES = ("payload", "json", "data", "info", "yf_info")


def resolve_column(df: DataFrame, candidates: tuple[str, ...], fallback_first: bool = True) -> str:
    """Runtime schema detection parity (§1.3): find the first matching
    column name; optionally fall back to the first column
    (details.py:47-51 falls back to column 0)."""
    cols = {c.lower(): c for c in df.columns}
    for cand in candidates:
        if cand.lower() in cols:
            return cols[cand.lower()]
    if fallback_first and df.columns:
        return df.columns[0]
    raise ValueError(f"no column among {candidates} in {df.columns}")


def read_symbols_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan with header + schema inference (details.py:260)."""
    return spark.read.csv(path, header=True, inferSchema=True)


def clean_symbols(df: DataFrame, symbol_col: str | None = None) -> DataFrame:
    """strip -> ''->NULL -> dropna -> dedup (details.py:262-271;
    dropDuplicates parity for main.py:313)."""
    col = symbol_col or resolve_column(df, SYMBOL_CANDIDATES)
    return (
        df.withColumn(col, clean_str(F.col(col)))
        .filter(F.col(col).isNotNull())
        .dropDuplicates([col])
        .withColumnRenamed(col, "symbol")
    )
