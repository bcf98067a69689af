#!/usr/bin/env python
"""Premise check for the r9 apply-ceiling lever (SCALE.md §CDC apply).

The r8 A/B showed the join-merge plan (merge_state_with_batch) loses
to the replay fold while the prior state must SHUFFLE into the join.
The named fix is storing state as a Spark BUCKETED table
(bucketBy(key) + saveAsTable) so the prior side's partitioning is
already join-compatible. This measures exactly that premise in
isolation: full-outer join of a 200k-row state (map-typed values)
with a 125k-row batch-fold shape, plain parquet vs bucketed table.

Result on local[8] (r8, quiet machine): plain 2 hash exchanges,
1.58 s; bucketed 1 exchange (batch side only), 0.72 s — the prior-side
exchange is gone and the join halves. The r9 work is the store
refactor (versioned bucketed tables + crash-atomic swap), not the
physics.

Usage: python tools/bench_bucketed_join.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n = 200_000
    state = spark.range(n).select(
        F.col("id").cast("string").alias("key"),
        F.map_from_arrays(
            F.array(F.lit("v")), F.array(F.col("id").cast("string"))
        ).alias("values"),
        F.col("id").alias("last_lsn"),
        F.lit(None).cast("long").alias("del_lsn"),
    )
    spark.sql("DROP TABLE IF EXISTS state_bucketed")
    (
        state.write.mode("overwrite")
        .bucketBy(8, "key")
        .sortBy("key")
        .format("parquet")
        .saveAsTable("state_bucketed")
    )
    state.write.mode("overwrite").parquet("/tmp/state_plain_bench")

    batch = spark.range(300_000, 425_000).select(
        F.col("id").cast("string").alias("key"),
        F.map_from_arrays(
            F.array(F.lit("v")), F.array(F.col("id").cast("string"))
        ).alias("__bv"),
        F.col("id").alias("__bl"),
    )
    for tag, prior in [
        ("plain_parquet", spark.read.parquet("/tmp/state_plain_bench")),
        ("bucketed_table", spark.table("state_bucketed")),
    ]:
        j = prior.join(batch, "key", "full_outer")
        n_exch = j._jdf.queryExecution().toString().count(
            "Exchange hashpartitioning"
        )
        t0 = time.time()
        cnt = j.count()
        print(
            f"{tag}: hash_exchanges={n_exch} rows={cnt} "
            f"join_time={time.time()-t0:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
