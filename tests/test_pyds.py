"""Python Data Source API: the pluggable REST-source shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8million_data__spark.pipelines.financials import unpivot_financials
from etl_8million_data__spark.sources.pyds import SymbolFixtureDataSource


def test_symbol_fixture_source_reads_partitioned(spark):
    spark.dataSource.register(SymbolFixtureDataSource)
    df = (
        spark.read.format("symbol_fixture")
        .option("symbols", "AAA,BBB,CCC,DDD,EEE")
        .option("numPartitions", "3")
        .load()
    )
    assert df.columns == ["symbol", "payload", "loaded_at"]
    assert df.rdd.getNumPartitions() == 3
    rows = {r.symbol: r.payload for r in df.collect()}
    assert set(rows) == {"AAA", "BBB", "CCC", "DDD", "EEE"}
    assert all('"longName"' in p for p in rows.values())


def test_symbol_fixture_feeds_unpivot_pipeline(spark):
    spark.dataSource.register(SymbolFixtureDataSource)
    raw = (
        spark.read.format("symbol_fixture").option("symbols", "AAA,BBB").load()
    )
    fact = unpivot_financials(raw)
    got = fact.groupBy("stock").agg(F.count(F.lit(1)).alias("n")).collect()
    # 3 statements x 2 freqs x 2 dates x 3 metrics = 36 rows per symbol
    assert {r.stock: r.n for r in got} == {"AAA": 36, "BBB": 36}
