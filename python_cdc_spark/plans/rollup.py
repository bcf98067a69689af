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
_KINDS = ("sum", "count", "min", "max", "hll")
# HLL sketch-measure geometry (matches queries/sketches.py conventions:
# mix32 hash, bin-length rho, dyadic 2^-r sum, shared alpha expression)
_HLL_P = 8
_HLL_M = 1 << _HLL_P


def _hll_registers(src: DataFrame, dims: dict[str, str], expr: str) -> DataFrame:
    """Per-dims HLL register table over a bigint expression: one row per
    (dims, bucket) with the max leading-zero rank — the max-mergeable
    representation that makes COUNT DISTINCT decomposable in a cube."""
    from python_cdc_spark.queries.sketches import _mix32

    names = list(dims)
    h = src.select(
        *[F.expr(e).alias(a) for a, e in dims.items()],
        _mix32(F.expr(expr)).alias("h"),
    )
    rest = 32 - _HLL_P
    w = F.shiftright(F.col("h"), _HLL_P)
    return (
        h.select(
            *names,
            (F.col("h") % _HLL_M).alias("bucket"),
            F.when(w == 0, F.lit(rest + 1))
            .otherwise(F.lit(rest + 1) - F.length(F.bin(w)))
            .alias("rho"),
        )
        .groupBy(*names, "bucket")
        .agg(F.max("rho").cast("int").alias("r"))
    )


def hll_estimate_from_registers(regs: DataFrame, dims: list[str]) -> DataFrame:
    """Raw HLL estimate per dims group from a register table — the same
    estimator expression as queries/sketches.py, so a DuckDB oracle
    replaying the register math matches bit-for-bit."""
    m = float(_HLL_M)
    agg = regs.groupBy(*dims).agg(
        F.count(F.lit(1)).cast("long").alias("_b"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), r)")
        ).alias("_s"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(m))
    est = alpha * F.lit(m) * F.lit(m) / (
        F.col("_s") + (F.lit(m) - F.col("_b"))
    )
    return agg.select(*dims, est.alias("_hll_est"))


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
        hlls = []
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
            elif kind == "max":
                aggs.append(F.max(c).alias(alias))
            else:
                hlls.append((alias, expr))
        dim_cols = [F.expr(e).alias(a) for a, e in dims.items()]
        if aggs:
            cube = src.groupBy(*dim_cols).agg(*aggs)
            cube.write.mode("overwrite").parquet(os.path.join(out, "data"))
        for alias, expr in hlls:
            _hll_registers(src, dims, expr).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"hll_{alias}"))
        _write_meta(out, fingerprint, params)
        return out

    # -- incremental maintenance ---------------------------------------

    def refresh(self, name: str, delta: DataFrame) -> None:
        """Fold an INSERT-ONLY delta into the cube: every supported
        measure is decomposable for appends (sum/count by SUM over
        partials, min/max by MIN/MAX, hll registers by MAX), so the
        refresh aggregates the delta and re-combines it with the stored
        partials — O(delta + cube), never a fact-table rescan. (Deletes
        would break min/max/hll; route those through a rebuild, or use
        cdc/ivm.py's signed-delta aggregates for sum/count-only cubes.)
        The directory swap is os-level rename (batch-maintenance
        context, single writer); the fingerprint is extended so
        ``index_is_current`` no longer matches the raw source — a later
        ``define`` against a fresh source fingerprint rebuilds."""
        import json
        import shutil

        out = os.path.join(self.base_dir, name)
        with open(os.path.join(out, "_meta.json")) as f:
            meta = json.load(f)
        params = meta["params"]
        dims = params["dims"]
        dim_cols = [F.expr(e).alias(a) for a, e in dims.items()]

        def swap(new_df: DataFrame, sub: str) -> None:
            cur, stage = os.path.join(out, sub), os.path.join(out, sub + "_stage")
            new_df.write.mode("overwrite").parquet(stage)
            old = cur + "_old"
            os.rename(cur, old)
            os.rename(stage, cur)
            shutil.rmtree(old)

        scalar = {
            a: (k, e)
            for a, (k, e) in (
                (a, tuple(v)) for a, v in params["measures"].items()
            )
            if k != "hll"
        }
        if scalar:
            delta_aggs = []
            merge_aggs = []
            for alias, (kind, expr) in scalar.items():
                c = F.expr(expr)
                if kind == "sum":
                    delta_aggs.append(F.sum(c.cast(_DEC)).alias(alias))
                    merge_aggs.append(F.sum(alias).alias(alias))
                elif kind == "count":
                    delta_aggs.append(F.count(c).cast("long").alias(alias))
                    merge_aggs.append(F.sum(alias).cast("long").alias(alias))
                elif kind == "min":
                    delta_aggs.append(F.min(c).alias(alias))
                    merge_aggs.append(F.min(alias).alias(alias))
                else:
                    delta_aggs.append(F.max(c).alias(alias))
                    merge_aggs.append(F.max(alias).alias(alias))
            d_cube = delta.groupBy(*dim_cols).agg(*delta_aggs)
            old_cube = self.spark.read.parquet(os.path.join(out, "data"))
            # align column order/types for the union
            cols = list(dims) + list(scalar)
            merged = (
                old_cube.select(cols)
                .unionByName(d_cube.select(cols))
                .groupBy(*dims)
                .agg(*merge_aggs)
            ).localCheckpoint(eager=True)  # sever lineage from the dir we swap
            swap(merged, "data")
        for alias, (kind, expr) in (
            (a, tuple(v)) for a, v in params["measures"].items()
        ):
            if kind != "hll":
                continue
            d_regs = _hll_registers(delta, dims, expr)
            old_regs = self.spark.read.parquet(
                os.path.join(out, f"hll_{alias}")
            )
            cols = list(dims) + ["bucket", "r"]
            merged = (
                old_regs.select(cols)
                .unionByName(d_regs.select(cols))
                .groupBy(*dims, "bucket")
                .agg(F.max("r").cast("int").alias("r"))
            ).localCheckpoint(eager=True)
            swap(merged, f"hll_{alias}")
        meta["fingerprint"] = meta.get("fingerprint", "") + "+delta"
        with open(os.path.join(out, "_meta.json"), "w") as f:
            json.dump(meta, f)

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
        scalar = [m for m in measures if params["measures"][m][0] != "hll"]
        hll = [m for m in measures if params["measures"][m][0] == "hll"]
        parts: list[DataFrame] = []
        if scalar:
            df = self.spark.read.parquet(
                os.path.join(self.base_dir, name, "data")
            )
            if predicate:
                df = df.filter(predicate)
            aggs = []
            for alias in scalar:
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
            parts.append(df.groupBy(*dims).agg(*aggs))
        for alias in hll:
            regs = self.spark.read.parquet(
                os.path.join(self.base_dir, name, f"hll_{alias}")
            )
            if predicate:
                regs = regs.filter(predicate)
            # fold away the dims being rolled up: registers merge by MAX
            folded = regs.groupBy(*dims, "bucket").agg(
                F.max("r").cast("int").alias("r")
            )
            parts.append(
                hll_estimate_from_registers(folded, dims).withColumnRenamed(
                    "_hll_est", alias
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p, dims) if dims else out.crossJoin(p)
        # keep the caller's measure order
        return out.select(*dims, *measures)


def finalize_sum_double(df: DataFrame, aliases: list[str]) -> DataFrame:
    """Round the exact decimal sum partials to the registry's output
    convention (round 4, double) — apply after the LAST re-aggregation."""
    out = df
    for a in aliases:
        out = out.withColumn(a, F.round(F.col(a), 4).cast("double"))
    return out
