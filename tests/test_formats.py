"""Source/sink format round-trips beyond parquet: ORC, JSON-lines, CSV.

The engine's canonical store is parquet (driver fixtures), but a
complete Spark source/sink surface must round-trip the other built-in
formats without value drift. Exactness is checked via integer-cents
sums + counts (CSV/JSON carry doubles through text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents


def _sig(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("l_extendedprice")).alias("s"),
        F.sum(cents("l_discount")).alias("d"),
        F.max("l_shipdate").alias("m"),
    ).collect()[0]
    return tuple(row)


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_format_roundtrip_lineitem(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / f"li.{fmt}")
    w = src.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    w.format(fmt).save(path)
    r = spark.read
    if fmt == "csv":
        # schema-on-read with the writer's schema: text formats don't
        # self-describe; inferSchema would round ts/doubles differently
        r = r.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss"
        ).schema(src.schema)
    elif fmt == "json":
        r = r.schema(src.schema)
    back = r.format(fmt).load(path)
    assert back.schema == src.schema
    assert _sig(back) == _sig(src)


def test_csv_permissive_quarantine(spark, tmp_path):
    """File-reader error tolerance (§2.10): PERMISSIVE mode + corrupt
    record column — bad rows are quarantined, not dropped and never
    fail the job (the reference's per-record try/except, details.py:287-296,
    as a declarative reader policy)."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,price,day\n"
        "1,10.5,2024-01-01\n"
        "2,not_a_number,2024-01-02\n"
        "3,30.25,not_a_date\n"
        "4,40.0,2024-01-04\n"
    )
    schema = "id int, price double, day date, _corrupt string"
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("dateFormat", "yyyy-MM-dd")
        .schema(schema)
        .csv(str(p))
    ).cache()
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert good.count() == 2 and bad.count() == 2
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    # quarantined rows keep the raw line for replay/debugging
    assert all("not_a_" in r["_corrupt"] for r in bad.collect())
