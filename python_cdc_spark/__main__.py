"""CLI: run engine queries from the shell.

    python -m python_cdc_spark list
    python -m python_cdc_spark run q1_pricing_summary [--sf-dir DIR] [-n 20]
    python -m python_cdc_spark sql "SELECT * FROM cdc_current_state LIMIT 5"
    python -m python_cdc_spark explain cdc_apply_changes
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python_cdc_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")
    run = sub.add_parser("run", help="run a registered query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("-n", type=int, default=20, help="rows to show")
    sql = sub.add_parser("sql", help="run SQL over registered views")
    sql.add_argument("query")
    sql.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sql.add_argument("-n", type=int, default=20)
    exp = sub.add_parser("explain", help="print a query's physical plan report")
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = ap.parse_args(argv)

    from python_cdc_spark.queries import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            spec = QUERIES[name]
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:35s} [{kind}] {spec.doc.strip().splitlines()[0][:70]}")
        return 0

    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run":
        if args.name not in QUERIES:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        QUERIES[args.name].fn(spark, args.sf_dir).show(args.n, truncate=False)
        return 0
    if args.cmd == "sql":
        from python_cdc_spark.sql_api import register_all

        register_all(spark, args.sf_dir)
        spark.sql(args.query).show(args.n, truncate=False)
        return 0
    if args.cmd == "explain":
        import json

        from python_cdc_spark.plans.checks import plan_report

        print(json.dumps(plan_report(QUERIES[args.name].fn(spark, args.sf_dir)), indent=2))
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
