"""Table catalog over the driver's parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet per table under an
``sf_dir`` like /root/testdata/sf0.01.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# InferFiltersFromGenerate adds `size(e) > 0 AND isnotnull(e)` below every
# explode(e). For this engine's explodes, e is an expensive computed
# expression (from_json payload maps, shingle/token transforms — all
# CodegenFallback, so no subexpression elimination rescues the copy), and
# predicate pushdown then drags the duplicated evaluation below the
# repartition into the narrow pre-shuffle stage: measured 10x on the
# MinHash band pipeline and 5x on the financials unpivot at sf0.1. The
# rule only pays off when the generator input is often empty AND cheap;
# every explode here is either pre-gated relationally or near-never
# empty, so it is excluded engine-wide.
_EXCLUDED_OPT_RULES = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def tune_session(spark: SparkSession) -> None:
    """Session tuning every engine entry point applies (idempotent);
    called from load_table so the driver's vanilla session gets it too."""
    try:
        existing = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        existing = None
    if not existing:
        spark.conf.set("spark.sql.optimizer.excludedRules", _EXCLUDED_OPT_RULES)
    elif _EXCLUDED_OPT_RULES not in existing:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", f"{existing},{_EXCLUDED_OPT_RULES}"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized
        # reader rejects outright. Read nanos as long, then floor-divide
        # to micros — the same truncation DuckDB applies, so oracle
        # comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div: nanos exceed double's exact-int range
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() can use them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
