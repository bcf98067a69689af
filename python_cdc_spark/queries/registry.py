"""Registration machinery for oracle-checked queries.

Determinism conventions (so the order-insensitive value hash matches):

- Alias every computed column identically in Spark and SQL.
- Sums/avgs over doubles go through an exact decimal accumulation and a
  final cast back to double (``dec_sum``): decimal addition is
  order-independent, so Spark's parallel partial aggregation and DuckDB's
  sequential sum produce bit-identical doubles.
- Any top-k / limit query orders by a unique key as the final tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def set_priority_order(first: list[str]) -> None:
    """Reorder the registry so ``first`` (in order) precedes everything else.

    The driver's correctness gate oracle-checks the first 50 registry
    entries, so registration order decides which operators get a verified
    CORRECTNESS row. The priority list is chosen for component breadth:
    one green row per SURVEY.md §2 component beats five redundant TPC-H
    greens. Unknown names are an error (catches typos when queries are
    renamed); queries not listed keep their original relative order after
    the prioritized block.
    """
    unknown = [n for n in first if n not in QUERIES]
    if unknown:
        raise KeyError(f"priority order references unregistered queries: {unknown}")
    rest = [n for n in QUERIES if n not in set(first)]
    reordered = {n: QUERIES[n] for n in list(first) + rest}
    QUERIES.clear()
    QUERIES.update(reordered)


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
