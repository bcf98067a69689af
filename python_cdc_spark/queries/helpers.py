"""Shared expression helpers keeping Spark and DuckDB bit-identical.

Floating-point summation is order-dependent; Spark's partial aggregation
order differs run-to-run and from DuckDB's. Routing each addend through a
fixed-scale decimal makes the accumulation exact (hence order-independent).

One subtlety: the per-row double→decimal cast itself is NOT bit-identical
across engines (DuckDB scales by 10^s in double arithmetic, which is
inexact above ~2^53/10^s, so a handful of rows round the 10th digit
differently). The divergence is bounded by one unit of the last decimal
digit per row, so the two exact decimal totals differ by ~1e-9. Rounding
the decimal total to 4 digits (exact decimal rounding, identical
half-away-from-zero semantics in both engines) absorbs that, and the
final decimal→double cast of equal decimals is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale chosen so TPC-H-ish money/quantity products fit: values < 1e18,
# 10 fractional digits — far more than the inputs' true precision, so
# per-row rounding loses nothing.
DEC = "decimal(30,10)"
_OUT_SCALE = 4


def dec_sum(col: Column, alias: str) -> Column:
    """Order-independent SUM over doubles, result typed double."""
    return F.round(F.sum(col.cast(DEC)), _OUT_SCALE).cast("double").alias(alias)


def dec_avg(col: Column, alias: str) -> Column:
    """Order-independent AVG: rounded exact decimal sum divided by count
    in double arithmetic (identical operands → identical IEEE result)."""
    return (
        F.round(F.sum(col.cast(DEC)), _OUT_SCALE).cast("double") / F.count(col)
    ).alias(alias)


def sql_dec_sum(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,10))), {_OUT_SCALE}) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_dec_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,10))), {_OUT_SCALE}) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# Post-CDC document corpus for the CDC-maintained index gates
# (dedup index, BM25 index) — ONE definition so the two gates cannot
# drift: base = doc_id < ~60% boundary; the delta INSERTs the rest,
# UPDATEs every 17th base doc (text || ' upd'), DELETEs every 23rd
# (unless it was updated). Deterministic on both engines.
CDC_CORPUS_CTES = """bounds AS (SELECT (MAX(doc_id) * 3) // 5 AS b FROM documents),
    corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id < (SELECT b FROM bounds) AND doc_id % 17 = 0
                  THEN text || ' upd' ELSE text END AS text
      FROM documents
      WHERE NOT (doc_id < (SELECT b FROM bounds)
                 AND doc_id % 23 = 0 AND doc_id % 17 <> 0)
    )"""
