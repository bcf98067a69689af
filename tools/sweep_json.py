#!/usr/bin/env python
"""Run tools/oracle_sweep.py over a name list and emit a JSON artifact.

Wrapper for the targeted heavy-query sweeps (e.g. SWEEP_SF10_r13): runs
the sweep as a subprocess (so its exit/stdout discipline is unchanged),
parses the PASS/MISMATCH/ERROR lines, and writes one JSON file with
pass/fail + wall seconds per query.

Usage:
  python tools/sweep_json.py <sf_dir> <out.json> [name ...]
Env: SPARK_GRAFT_DUCKDB_MEM / SPARK_GRAFT_ORACLE_TIMEOUT pass through.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time


def main() -> None:
    sf, out_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "oracle_sweep.py"), sf, *names],
        capture_output=True,
        text=True,
    )
    rows = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"PASS (\S+) \((oracle|rows-only), ([0-9.]+)s\)", line)
        if m:
            rows[m.group(1)] = {"status": "PASS", "kind": m.group(2), "sec": float(m.group(3))}
            continue
        m = re.match(r"(MISMATCH|ERROR) (\S+?):", line)
        if m:
            rows[m.group(2)] = {"status": m.group(1), "detail": line[:300]}
    summary = re.search(r"SWEEP_DONE.*", proc.stdout)
    art = {
        "sf_dir": sf,
        "queries": rows,
        "pass": sum(1 for r in rows.values() if r["status"] == "PASS"),
        "mismatch": sum(1 for r in rows.values() if r["status"] == "MISMATCH"),
        "error": sum(1 for r in rows.values() if r["status"] == "ERROR"),
        "wall_sec": round(time.time() - t0, 1),
        "summary": summary.group(0) if summary else None,
        "duckdb_mem": os.environ.get("SPARK_GRAFT_DUCKDB_MEM"),
        "oracle_timeout": os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT"),
    }
    with open(out_path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps({k: v for k, v in art.items() if k != "queries"}))
    if proc.returncode != 0:
        print(proc.stdout[-2000:], file=sys.stderr)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
