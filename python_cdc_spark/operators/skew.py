"""Skew mitigation: salted two-phase aggregation and replicated joins.

AQE's skew-join splitting covers sort-merge joins at runtime; salting is
the explicit idiom for hot GROUP BY keys (a handful of keys holding most
rows — exactly the shape of `l_returnflag` or a power-law user_id). The
two-phase shape also demonstrates the map-side-combine contract: phase 1
aggregates (key, salt) partitions, phase 2 folds the S partials per key,
so no single reducer sees a hot key's full row set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate families that decompose over partials: final(f(partials))
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[Column, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase GROUP BY with a synthetic salt.

    ``aggs``: (expression, family, alias) with family ∈ sum/count/min/max
    (the decomposable aggregates). Results are IDENTICAL to a direct
    groupBy — decimal-routed sums stay exact across the extra phase —
    which is what the oracle query asserts.

    The salt is derived from a uniformly-distributed existing expression
    (monotonic ids work; a random salt would break retry determinism).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for i, (expr, family, alias) in enumerate(aggs):
        if family not in _DECOMPOSABLE:
            raise ValueError(f"non-decomposable aggregate: {family}")
        phase1, phase2 = _DECOMPOSABLE[family]
        partial_exprs.append(phase1(expr).alias(f"__p{i}"))
        final_exprs.append(phase2(F.col(f"__p{i}")).alias(alias))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def replicated_skew_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Hot-key equi-join without a hot reducer: the large side salts its
    key into ``salt_buckets`` sub-keys; the small side is replicated
    once per bucket (explode), so each (key, salt) pair lands on its own
    task. Use when the small side is too big to broadcast outright but
    the key distribution is pathological."""
    salted_large = large.withColumn(
        "__salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_large.join(replicated_small, [key, "__salt"]).drop("__salt")
