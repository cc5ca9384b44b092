"""CLI entry point: ``python -m etl_8million_data__spark <cmd>``.

Commands:
  list                               all registered query names (+tags)
  query NAME [--sf DIR] [--limit N]  run one library query, print rows
  sql "SELECT ..." [--sf DIR]        ad-hoc SQL over the fixture views
  explain NAME [--sf DIR]            formatted physical plan for a query

This is the "switch from the reference" surface: everything the
reference's hand-ordered scripts computed is a named query here
(COVERAGE.md maps them), runnable one command at a time.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_8million_data__spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")
    for c in ("query", "explain"):
        p = sub.add_parser(c)
        p.add_argument("name")
        p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if c == "query":
            p.add_argument("--limit", type=int, default=20)
    p = sub.add_parser("sql")
    p.add_argument("statement")
    p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    from etl_8million_data__spark.plans import all_queries

    qs = all_queries()
    if args.cmd == "list":
        for name in sorted(qs):
            q = qs[name]
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name}  [{oracle}]  {','.join(q.tags)}")
        return 0

    if args.cmd in ("query", "explain") and args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2

    from etl_8million_data__spark.session import get_spark

    spark = get_spark("etl8m-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "sql":
            from etl_8million_data__spark.catalog import register_views

            register_views(spark, args.sf)
            spark.sql(args.statement).show(args.limit, truncate=False)
            return 0
        df = qs[args.name].build(spark, args.sf)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
