"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` single-JVM; the config choices are the
ones that matter identically on a real multi-executor cluster at 100 TB:
AQE (runtime coalesce + skew-join splitting), broadcast threshold,
Arrow for the few pandas-UDF paths, UTC session time (the reference
stores naive-UTC datetimes, details.py:39-44).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl8m-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 to match
    the driver's bench environment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Shuffle sizing: 2x cores locally; on a real cluster this would be
        # sized to ~128-200MB per task post-AQE; AQE coalesces either way.
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # keep managed-table data (bucketing tests/demos) out of the repo
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "etl8m-warehouse"),
        )
    )
    spark = builder.getOrCreate()
    from etl_8million_data__spark.catalog import tune_session

    tune_session(spark)
    return spark
