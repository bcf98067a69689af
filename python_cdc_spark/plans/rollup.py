"""Materialized rollups with subsumption-based query rewrite.

The warehouse MV capability: ``RollupCatalog.define`` materializes a
partial aggregate (the "rollup") once; ``rewrite`` answers any
aggregate query whose dimensions are a SUBSET of a rollup's dimensions
and whose measures are re-aggregable from it — reading the rollup's
few-thousand-row table instead of the fact table. At 100 TB this is
the difference between a dashboard query scanning 10^12 rows and one
scanning 10^3: the rollup is built in one pass, maintained
incrementally (see ``cdc/ivm.py`` for the signed-delta refresh of
exactly this aggregate shape), and every covered query after that is
metadata-scale.

Correctness of the rewrite (exact, not approximate):

- ``sum`` measures are STORED AS decimal(30,10) partials. Decimal
  addition is exact and associative, so re-aggregating group partials
  equals aggregating the raw rows in any order — the rewrite is
  bit-identical to the direct plan after the final round+cast, the
  same argument ``queries/helpers.dec_sum`` makes for parallel
  aggregation.
- ``count`` re-aggregates by SUM, ``min``/``max`` by MIN/MAX — all
  decomposable. ``avg`` is intentionally absent: derive it as
  sum/count at the call site (it does not re-aggregate).
- Predicates may only reference rollup dimensions (checked): a filter
  on a non-dimension column would need the raw rows.

Staleness: each rollup directory carries the same stat-fingerprint
meta as the ANN index store (``operators/ann_index.py``) — ``define``
is load-or-build, so registered queries can call it unconditionally
and only the first call per (source, params) pays the build.
``base_dir`` must be a LOCAL path (os-primitive markers + Spark
parquet, same constraint as the other index stores).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.operators.ann_index import (
    _write_meta,
    index_is_current,
)

_DEC = "decimal(30,10)"
_KINDS = ("sum", "count", "min", "max")


class RollupCatalog:
    """A directory of materialized rollups + the rewrite that uses them."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- build ----------------------------------------------------------

    def define(
        self,
        name: str,
        src: DataFrame,
        dims: dict[str, str],
        measures: dict[str, tuple[str, str]],
        fingerprint: str = "",
        force: bool = False,
    ) -> str:
        """Materialize ``groupBy(dims)`` over ``src``: ``dims`` maps
        alias -> SQL expr (identity for plain columns), ``measures``
        maps alias -> (kind, sql_expr). Load-or-build keyed on
        (fingerprint, dims, measures); returns the rollup directory."""
        out = os.path.join(self.base_dir, name)
        params = {
            "dims": dict(dims),
            "measures": {a: [k, e] for a, (k, e) in measures.items()},
        }
        if not force and index_is_current(out, fingerprint, params):
            return out
        aggs = []
        for alias, (kind, expr) in measures.items():
            if kind not in _KINDS:
                raise ValueError(f"unsupported measure kind {kind!r}")
            c = F.expr(expr)
            if kind == "sum":
                aggs.append(F.sum(c.cast(_DEC)).alias(alias))
            elif kind == "count":
                aggs.append(F.count(c).cast("long").alias(alias))
            elif kind == "min":
                aggs.append(F.min(c).alias(alias))
            else:
                aggs.append(F.max(c).alias(alias))
        cube = src.groupBy(
            *[F.expr(e).alias(a) for a, e in dims.items()]
        ).agg(*aggs)
        cube.write.mode("overwrite").parquet(os.path.join(out, "data"))
        _write_meta(out, fingerprint, params)
        return out

    # -- rewrite --------------------------------------------------------

    def _catalog(self) -> dict[str, dict]:
        import json

        entries = {}
        for name in sorted(os.listdir(self.base_dir)):
            meta_path = os.path.join(self.base_dir, name, "_meta.json")
            try:
                with open(meta_path) as f:
                    entries[name] = json.load(f)["params"]
            except (OSError, ValueError, KeyError):
                continue
        return entries

    def rewrite(
        self,
        dims: list[str],
        measures: list[str],
        predicate: Optional[str] = None,
        predicate_dims: Optional[list[str]] = None,
    ) -> DataFrame:
        """Answer groupBy(dims).agg(measures) from the smallest covering
        rollup. ``predicate`` (SQL over dims) is applied BEFORE the
        re-aggregation and may only reference ``predicate_dims``
        (each must be a rollup dimension — checked). Raises LookupError
        when no rollup covers the request."""
        need_dims = set(dims) | set(predicate_dims or [])
        best: Optional[tuple[int, str, dict]] = None
        for name, params in self._catalog().items():
            have_dims = set(params["dims"])
            have_meas = params["measures"]
            if not need_dims <= have_dims:
                continue
            if not set(measures) <= set(have_meas):
                continue
            key = (len(have_dims), name)
            if best is None or key < (best[0], best[1]):
                best = (len(have_dims), name, params)
        if best is None:
            raise LookupError(
                f"no rollup covers dims={sorted(need_dims)} "
                f"measures={sorted(measures)}"
            )
        _, name, params = best
        df = self.spark.read.parquet(
            os.path.join(self.base_dir, name, "data")
        )
        if predicate:
            df = df.filter(predicate)
        aggs = []
        for alias in measures:
            kind = params["measures"][alias][0]
            col = F.col(alias)
            if kind == "sum":
                aggs.append(F.sum(col).alias(alias))  # decimal: exact
            elif kind == "count":
                aggs.append(F.sum(col).cast("long").alias(alias))
            elif kind == "min":
                aggs.append(F.min(col).alias(alias))
            else:
                aggs.append(F.max(col).alias(alias))
        return df.groupBy(*dims).agg(*aggs)


def finalize_sum_double(df: DataFrame, aliases: list[str]) -> DataFrame:
    """Round the exact decimal sum partials to the registry's output
    convention (round 4, double) — apply after the LAST re-aggregation."""
    out = df
    for a in aliases:
        out = out.withColumn(a, F.round(F.col(a), 4).cast("double"))
    return out
