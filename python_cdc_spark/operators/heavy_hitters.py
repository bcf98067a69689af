"""Exact distributed heavy hitters: Misra-Gries candidates + recount.

Two passes, bounded memory, no full-vocabulary shuffle:

1. **Candidate generation** — each partition folds its rows through a
   capacity-K Misra-Gries summary (batched-decrement variant) inside
   one Arrow ``mapInPandas``: per Arrow batch the counting is a
   vectorized ``value_counts``; the Python-side work is a dict merge
   over the batch's DISTINCT keys, never per row. When the summary
   exceeds K keys, the (K+1)-th largest count is subtracted from every
   counter and non-positive counters drop — each such event removes at
   least (K+1)·sub total mass while undercounting any single key by at
   most ``sub``, so a partition summary undercounts any key by at most
   N_part/(K+1). The union of partition summaries therefore contains
   EVERY key with global frequency > N/(K+1) — no merge shuffle needed,
   a candidate SUPERSET is enough because pass 2 recounts exactly.
2. **Exact recount** — the candidate set (≤ partitions × K keys)
   broadcasts into a semi-join; only candidate keys are counted
   exactly, and the frequency-threshold filter makes the result EXACT
   (identical to a full groupBy + HAVING) whenever
   threshold ≥ N/inv_phi > N/(K+1), which ``exact_heavy_hitters``
   asserts statically: ``capacity + 1 > inv_phi``.

At 100 TB this is the difference between shuffling every distinct key
(a groupBy over a trillion-key vocabulary) and shuffling a few
thousand candidates: pass 1 is map-side only (zero shuffle), pass 2
shuffles candidate keys alone. The threshold is RATIONAL
(``freq * inv_phi >= N``) so both engines compare integers — no
float-ceil edge between Spark and an oracle.

Reference scope: the reference engine (a 674-line protocol decoder)
has no sketch surface; this extends the E11 sketch family
(HLL/count-min/KMV/KLL/Bloom, ``queries/sketches.py``) with the
frequent-items member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Partition-local Misra-Gries summaries, union'd: one column
    (``col``) of candidate keys, at most ``capacity`` per partition.
    Guarantee: contains every key with global frequency > N/(capacity+1).
    """
    out_schema = df.select(col).schema

    def mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # vectorized per batch; the merge loop touches only the
            # batch's distinct keys
            for key, c in pdf[col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                sub = vals[capacity]  # the (capacity+1)-th largest
                counters = {k: v - sub for k, v in counters.items() if v > sub}
        yield pd.DataFrame({col: pd.Series(list(counters.keys()), dtype=object)})

    return df.select(col).mapInPandas(mg, out_schema)


def exact_heavy_hitters(
    df: DataFrame, col: str, capacity: int = 512, inv_phi: int = 500
) -> DataFrame:
    """All keys whose frequency satisfies ``freq * inv_phi >= N``
    (i.e. freq ≥ N/inv_phi), with EXACT frequencies — equal to a full
    ``GROUP BY col HAVING COUNT(*) * inv_phi >= N`` but without ever
    shuffling the full vocabulary. Returns (col, freq).

    The exactness precondition is static: the MG guarantee covers every
    key above N/(capacity+1), and the threshold N/inv_phi exceeds that
    exactly when ``capacity + 1 > inv_phi``.

    NULL keys are excluded from the result (SQL GROUP BY keeps a NULL
    group, but pandas value_counts and the recount equi-join both drop
    it), and N is counted over the NULL-FILTERED frame so the threshold
    agrees with the keys being counted — on a nullable column the
    result equals ``GROUP BY col HAVING COUNT(*) * inv_phi >= N`` over
    ``WHERE col IS NOT NULL``.
    """
    if capacity + 1 <= inv_phi:
        raise ValueError(
            f"exactness needs capacity + 1 > inv_phi, got {capacity=} {inv_phi=}"
        )
    df = df.filter(F.col(col).isNotNull())
    cands = mg_candidates(df, col, capacity).distinct()
    stats = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.select(col)
        .join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .crossJoin(F.broadcast(stats))
        .filter(F.col("freq") * inv_phi >= F.col("__n"))
        .drop("__n")
    )
