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
    cur = sub.add_parser(
        "curate",
        help="run the full curation pipeline and WRITE the survivor "
        "corpus (split-partitioned parquet; docs, not just counts)",
    )
    cur.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    cur.add_argument("out")
    cur.add_argument(
        "--zorder",
        action="store_true",
        help="additionally cluster each split's files by (source hash, "
        "n_tok) for multi-dim scan pruning",
    )

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
    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from python_cdc_spark.io import write_partitioned, write_zordered
        from python_cdc_spark.queries.llm_curation import curation_survivors

        surv = curation_survivors(spark, args.sf_dir)
        if args.zorder:
            # per split so the directory layout still prunes on split
            for split in ("train", "val", "test"):
                write_zordered(
                    surv.filter(F.col("split") == split)
                    .withColumn("src_h", F.xxhash64("source"))
                    .drop("split"),
                    f"{args.out}/split={split}",
                    ["src_h", "n_tok"],
                    n_files=8,
                )
        else:
            write_partitioned(surv, args.out, ["split"])
        stats = (
            spark.read.parquet(args.out)
            .groupBy()
            .agg(F.count("*").alias("docs"), F.sum("n_tok").alias("tokens"))
            .first()
        )
        print(f"wrote {stats['docs']} docs / {stats['tokens']} tokens -> {args.out}")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
