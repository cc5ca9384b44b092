"""Driver-contract simulator: vanilla SparkSession, import __spark_entry__,
run entry() smoke then queries() vs oracle_sql() on DuckDB.

Usage: python tools/drive_contract.py [--sf DIR] [--names a,b,c] [--skip-entry]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None, help="comma-separated query subset")
    ap.add_argument("--skip-entry", action="store_true")
    ap.add_argument(
        "--spark-only",
        action="store_true",
        help="run Spark side only (count rows), skip DuckDB oracles — scale smoke",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    import __spark_entry__ as E
    from oracle import compare

    if not args.skip_entry:
        t0 = time.time()
        df = E.entry(spark)
        rows = df.collect()
        cols = [f.name for f in df.schema.fields]
        print(f"ENTRY OK rows={len(rows)} schema={cols} {time.time() - t0:.1f}s")

    qs, oracles = E.queries(), E.oracle_sql()
    names = sorted(qs) if not args.names else args.names.split(",")
    fails = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            if args.spark_only or name not in oracles:
                ok, msg = (sdf.count() >= 0), f"rows-only ({sdf.count()} rows)"
            else:
                ok, msg = compare(sdf, oracles[name], args.sf)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg} ({time.time() - t0:.1f}s)")
        if not ok:
            fails.append(name)
    print(f"RESULT: {len(names) - len(fails)}/{len(names)} pass; fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
