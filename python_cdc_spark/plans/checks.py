"""Plan checks: make the 100 TB guardrails assertable.

The reference has no optimizer to inspect (SURVEY.md §4.1); on Spark the
physical plan IS the performance contract, so these helpers turn
".explain and iterate" into testable predicates:

- filters actually pushed to the parquet scan (``PushedFilters``),
- scans pruned to the referenced columns (``ReadSchema``),
- dimension joins actually broadcast (no fact-side shuffle),
- no cartesian products sneaking in.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scanned_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan column sets from ReadSchema (column-pruning check)."""
    txt = explain_str(df)
    scans: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count — the number to *minimize* when iterating a plan."""
    return len(re.findall(r"\bExchange hashpartitioning", explain_str(df)))


def plan_report(df: DataFrame) -> dict:
    """One-call summary for notebooks/CI."""
    txt = explain_str(df)
    return {
        "pushed_filters": pushed_filters(df),
        "scanned_columns": [sorted(s) for s in scanned_columns(df)],
        "broadcast_join": "BroadcastHashJoin" in txt,
        "bnl_join": "BroadcastNestedLoopJoin" in txt,
        "sort_merge_join": "SortMergeJoin" in txt,
        "cartesian": "CartesianProduct" in txt,
        "n_hash_exchanges": len(re.findall(r"\bExchange hashpartitioning", txt)),
        "whole_stage_codegen": "WholeStageCodegen" in txt,
        "aqe": "AdaptiveSparkPlan" in txt,
    }
