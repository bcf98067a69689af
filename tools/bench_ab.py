#!/usr/bin/env python
"""Standing cross-tree A/B bench (VERDICT r9 item #4): measure the same
representative queries on the CURRENT tree and on the PRIOR round's
pinned tree, interleaved in the same session pattern, so a uniform
bench drift can be adjudicated mechanically — if the pinned tree
reproduces the current tree's times, the box moved, not the code.

The five rows are plan-family representatives that change rarely; a
round that touches one of them should read its A/B delta as code+box,
the others as box alone. Box state (loadavg, cpu count, governor when
readable) is recorded alongside.

Pattern per tree: one fresh spark-submit-style subprocess, warmup
query, then median-of-3 end-to-end count() per row — the same shape
bench.py uses. Trees alternate B,A so neither side systematically
enjoys a warmer page cache.

Usage: python tools/bench_ab.py [prev_ref] [sf_dir]
  prev_ref defaults to the newest commit whose subject starts with
  "round " (the driver's end-of-round commit).
Writes one JSON line to stdout; commit it as BENCH_AB_r{N}.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    "q3_shipping_priority",     # TPC-H 3-way broadcast join
    "window_topk_per_group",    # partitioned window rank
    "cdc_apply_changes",        # change-feed argmax fold
    "sketch_hll_orderkeys",     # mergeable-sketch fold
    "text_quality_score",       # map-side text features
]

_RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from python_cdc_spark.session import get_spark
from python_cdc_spark.queries import QUERIES
sf = sys.argv[2]
rows = json.loads(sys.argv[3])
spark = get_spark(app_name="bench_ab")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["q6_forecast_revenue"].fn(spark, sf).count()  # warmup
out = {}
for name in rows:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf).count()
        ts.append(time.perf_counter() - t0)
    out[name] = round(sorted(ts)[1], 4)
print("AB_RESULT " + json.dumps(out))
"""


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def default_prev_ref() -> str:
    out = _git("log", "--format=%H %s", "-200")
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if subj.startswith("round "):
            return sha
    raise SystemExit("no 'round N' commit found; pass prev_ref explicitly")


def run_tree(tree: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir, json.dumps(ROWS)],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"runner produced no result in {tree}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def box_state() -> dict:
    st: dict = {"cpus": os.cpu_count()}
    try:
        with open("/proc/loadavg") as f:
            st["loadavg"] = f.read().split()[:3]
    except OSError:
        pass
    gov = "/sys/devices/system/cpu/cpu0/cpufreq/scaling_governor"
    try:
        with open(gov) as f:
            st["governor"] = f.read().strip()
    except OSError:
        st["governor"] = "unreadable"
    return st


def main() -> None:
    prev_ref = sys.argv[1] if len(sys.argv) > 1 else default_prev_ref()
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    prev_sha = _git("rev-parse", prev_ref)
    cur_sha = _git("rev-parse", "HEAD")

    with tempfile.TemporaryDirectory(prefix="bench_ab_prev_") as tmp:
        wt = os.path.join(tmp, "prev")
        _git("worktree", "add", "--detach", wt, prev_sha)
        try:
            state_before = box_state()
            # B (pinned prior tree) first, then A (current): if the box
            # is hot, the order handicaps the PINNED side, biasing
            # against the "box moved" conclusion rather than toward it
            prev_times = run_tree(wt, sf_dir)
            cur_times = run_tree(REPO, sf_dir)
            state_after = box_state()
        finally:
            _git("worktree", "remove", "--force", wt)

    per_query = {}
    for name in ROWS:
        a, b = cur_times.get(name), prev_times.get(name)
        per_query[name] = {
            "current_sec": a,
            "prev_tree_sec": b,
            "ratio_cur_over_prev": round(a / b, 3) if a and b else None,
        }
    print(json.dumps({
        "metric": "cross_tree_ab",
        "unit": "sec",
        "sf_dir": sf_dir,
        "current_sha": cur_sha,
        "prev_sha": prev_sha,
        "box_before": state_before,
        "box_after": state_after,
        "per_query": per_query,
        "interpretation": (
            "ratios ~1.0 on untouched rows => both trees see the same "
            "box; a uniform shift vs the prior round's committed bench "
            "numbers is then environmental, not code"
        ),
    }))


if __name__ == "__main__":
    main()
