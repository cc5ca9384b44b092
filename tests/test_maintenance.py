"""Compaction and clustered-write maintenance operators: prove the
file-count reduction, the value preservation, and — via the parquet
footers — that clustering really produces prunable statistics."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.functions.exact import cents
from etl_8million_data__spark.operators.maintenance import (
    clustered_write,
    compact_parquet,
    parquet_data_files,
)


def _sig(df):
    return tuple(
        df.agg(
            F.count(F.lit(1)),
            F.sum(cents("l_extendedprice")),
            F.min("l_orderkey"),
            F.max("l_orderkey"),
        ).collect()[0]
    )


def test_compaction_reduces_files_preserves_values(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li")
    src.repartition(64).write.parquet(path)  # simulate streaming small files
    assert len(parquet_data_files(path)) >= 64
    before = _sig(spark.read.parquet(path))
    n_after = compact_parquet(spark, path, target_file_bytes=8 << 20)
    assert n_after < 64
    assert _sig(spark.read.parquet(path)) == before


def test_clustered_write_row_group_stats_disjoint(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_clustered")
    clustered_write(src, path, ["l_orderkey"], n_files=8)
    ranges = []
    for f in parquet_data_files(path):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_orderkey")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) >= 8
    ranges.sort()
    # range partitioning + sort => row-group key ranges overlap at most
    # at boundaries: each group's max <= next group's min (ties allowed)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping row-group stats: {(lo1, hi1)} vs {(lo2, hi2)}"
    # and values survive the clustered rewrite
    assert _sig(spark.read.parquet(path)) == _sig(src)


def test_zorder_write_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordering on (l_orderkey, l_extendedprice) must make row-group min/max
    selective on BOTH columns simultaneously — the multi-dimensional
    data-skipping property single-key clustering cannot provide (a
    single-key sort leaves the other column spanning ~the full domain
    in every row group)."""
    from etl_8million_data__spark.operators.maintenance import zorder_write

    src = load_table(spark, sf_dir, "lineitem")

    def avg_coverage(path, col):
        spans, total_lo, total_hi = [], None, None
        for f in parquet_data_files(path):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append((st.min, st.max))
        total_lo = min(lo for lo, _ in spans)
        total_hi = max(hi for _, hi in spans)
        dom = max(total_hi - total_lo, 1)
        return sum(hi - lo for lo, hi in spans) / (len(spans) * dom), len(spans)

    zpath = str(tmp_path / "li_zorder")
    zorder_write(src, zpath, ["l_orderkey", "l_extendedprice"], n_files=16)
    cpath = str(tmp_path / "li_single")
    clustered_write(src, cpath, ["l_orderkey"], n_files=16)

    zp, nz = avg_coverage(zpath, "l_orderkey")
    zs, _ = avg_coverage(zpath, "l_extendedprice")
    cp, nc = avg_coverage(cpath, "l_orderkey")
    cs, _ = avg_coverage(cpath, "l_extendedprice")
    assert nz >= 16 and nc >= 16
    # single-key clustering: tight on the sorted key, useless on the other
    assert cp < 0.15
    assert cs > 0.6
    # z-order: genuinely selective on BOTH dimensions at once
    assert zp < 0.5 and zs < 0.5, (zp, zs)
    # and values survive the rewrite
    assert _sig(spark.read.parquet(zpath)) == _sig(src)
