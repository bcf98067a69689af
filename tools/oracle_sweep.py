#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary scale factor.

The driver's correctness gate compares every ``queries()`` entry with
its ``oracle_sql()`` twin at sf0.01; the test suite repeats that bar.
This tool runs the SAME differ (tests/oracle.py — the strictest local
reading of the driver's hash) over any testdata directory, so scale-
dependent divergence (float accumulation order, overflow, sampling
rates, join cardinality cliffs) gets its own receipt.

r7 receipt: 153/153 pass at sf0.1 (mismatch=0 error=0), NOTES_r7.md.

Usage: python tools/oracle_sweep.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import duckdb

    from python_cdc_spark.queries import QUERIES
    from python_cdc_spark.session import get_spark
    from tests.oracle import assert_matches_oracle

    spark = get_spark(app_name="oracle_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # sf1 sweeps share the box with the Spark JVM: an explicit DuckDB
    # cap turns an oracle OOM into a recorded per-query ERROR instead
    # of letting the OS pick a process to kill (default: no cap)
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        # an IN-MEMORY DuckDB has no temp_directory, so a memory cap
        # alone turns the heavy CC/curation oracles into hard OOM
        # ("failed to offload data block") instead of a spill — give it
        # one, and bound the spill too: a quadratic oracle otherwise
        # fills the disk before it fails (graph_triangle_count at sf1
        # wrote 70 GB of temp before ENOSPC)
        import tempfile

        con.execute(
            f"SET temp_directory='{tempfile.mkdtemp(prefix='duckdb_sweep_')}'"
        )
        con.execute("SET max_temp_directory_size='32GB'")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings events_zipf"
    ).split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            # make_sf_scale.py writes each table as a DIRECTORY of one
            # file per replica (Spark reads it natively; DuckDB needs
            # the glob)
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            # Normalize the timestamp FLAVOR exactly like the engine's
            # io.table() does for Spark: .sf1 carries TIMESTAMPTZ
            # (instant semantics for Spark), but DuckDB's date functions
            # change RETURN TYPE on tz-aware inputs (date_trunc: DATE vs
            # TIMESTAMPTZ), which would skew every date-typed oracle.
            # Machine TZ is UTC, so the cast changes no values.
            cols = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
            sel = ", ".join(
                f'CAST("{c}" AS TIMESTAMP) AS "{c}"'
                if ty == "TIMESTAMP WITH TIME ZONE"
                else f'"{c}"'
                for c, ty, *_ in cols
            )
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT {sel} FROM read_parquet('{src}')"
            )

    # optional name filters: any further args restrict the sweep to
    # queries whose name contains one of them (targeted re-checks);
    # "--skip <file>" drops names listed one-per-line (resume support)
    argv = sys.argv[2:]
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        with open(argv[i + 1]) as fh:
            skip = {line.strip() for line in fh if line.strip()}
        argv = argv[:i] + argv[i + 2:]
    filters = argv
    items = {
        n: s
        for n, s in QUERIES.items()
        if n not in skip and (not filters or any(f in n for f in filters))
    }
    # Per-query wall budget for the ORACLE side (sf1 sweeps: a handful
    # of oracles are quadratic there — interrupt and record, don't hang
    # the whole receipt). DuckDB ignores Python signals mid-query, so a
    # watchdog thread calls con.interrupt() instead. The timer arms via
    # the differ's on_oracle_start hook — i.e. only AFTER the Spark side
    # has fully materialized — so the budget covers DuckDB alone: a slow
    # Spark query can neither be mislabeled ORACLE_TIMEOUT nor fire an
    # idle interrupt that poisons the NEXT oracle execution.
    budget = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0") or 0)
    import threading

    ok, bad, err = [], [], []
    timer = None
    for name, spec in items.items():
        t0 = time.time()
        timer = None

        def _arm_watchdog():
            nonlocal timer
            if budget > 0:
                timer = threading.Timer(budget, con.interrupt)
                timer.daemon = True
                timer.start()

        try:
            df = spec.fn(spark, sf)
            if spec.oracle is None:
                assert df.count() >= 0
                kind = "rows-only"
            else:
                assert_matches_oracle(
                    df, con, spec.oracle, name=name,
                    on_oracle_start=_arm_watchdog,
                )
                kind = "oracle"
            ok.append(name)
            print(f"PASS {name} ({kind}, {time.time()-t0:.1f}s)", flush=True)
        except AssertionError as e:
            bad.append(name)
            print(f"MISMATCH {name}: {str(e)[:300]}", flush=True)
        except Exception as e:  # keep sweeping; report at the end
            err.append(name)
            what = type(e).__name__
            if "interrupt" in what.lower() or "interrupt" in str(e).lower():
                what = f"ORACLE_TIMEOUT>{int(budget)}s"
            print(f"ERROR {name}: {what} {str(e)[:200]}", flush=True)
        finally:
            if timer is not None:
                timer.cancel()
    print(
        f"SWEEP_DONE sf_dir={sf} pass={len(ok)} "
        f"mismatch={len(bad)} error={len(err)}",
        flush=True,
    )
    if bad:
        print("MISMATCHES:", bad)
    if err:
        print("ERRORS:", err)
    sys.exit(1 if (bad or err) else 0)


if __name__ == "__main__":
    main()
