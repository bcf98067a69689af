#!/usr/bin/env python
"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence files for
the optimization rounds.

Usage: python tools/capture_plans.py <tag> <suffix> <query> [query ...]
   e.g. python tools/capture_plans.py r13 before rollup_cdc_maintained

Runs at sf0.1 by default ($SPARK_GRAFT_SF_DIR). Note: gates that fold
on disk and return a localCheckpointed frame show the checkpoint scan
as their top-level plan; their internal stages are captured by the
operator-level profiling tools instead (documented per query in
OPTIMIZATION_r*.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_cdc_spark.queries import QUERIES
    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(explain_formatted(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
