"""Persistent ANN index: the build-once / query-many contract on disk.

The in-process caches (`_fitted_centroids`, `_pq_codebook`, …) amortize
index build within a session; this module persists the two index halves
so a separate query job — or a 1000-executor cluster — starts from
parquet:

- ``centroids`` / ``codebook``: k-row / m·k-row metadata → single
  parquet files.
- ``cells``: the inverted lists JOINED with the codes — one row per
  (vec_id, sub, code) carrying the coarse ``cell`` — written
  Hive-partitioned BY CELL. A query probing ``nprobe`` cells then reads
  ONLY those directories: the probe is partition PRUNING
  (``PartitionFilters`` in the scan), not a filter over the full codes
  table. At 100 TB this is the difference between scanning nprobe/k of
  the index and scanning all of it to throw most away.

Layout under ``<dir>/``: ``centroids.parquet``, ``codebook.parquet``,
``cells.parquet/cell=<c>/…``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.io import write_partitioned


def save_ivfpq_index(
    out_dir: str,
    centroids: DataFrame,
    assigned: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """Persist a built IVF-PQ index. ``assigned`` is (neighbor_id, cell)
    inverted lists; ``codes`` is (id, sub, code). The join runs once at
    build time so query jobs never touch the unpartitioned codes."""
    centroids.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids.parquet"))
    codebook.write.mode("overwrite").parquet(os.path.join(out_dir, "codebook.parquet"))
    cells = codes.withColumnRenamed(id_col, "neighbor_id").join(
        assigned, "neighbor_id"
    )
    write_partitioned(cells, os.path.join(out_dir, "cells.parquet"), ["cell"])


def load_ivfpq_index(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Load the persisted index. ``cells`` keeps its partition column;
    filter it on ``cell`` (e.g. by joining the probe list) and the scan
    prunes whole directories."""
    return {
        "centroids": spark.read.parquet(os.path.join(out_dir, "centroids.parquet")),
        "codebook": spark.read.parquet(os.path.join(out_dir, "codebook.parquet")),
        "cells": spark.read.parquet(os.path.join(out_dir, "cells.parquet")),
    }


def ivf_pq_topk_from_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_top: int = 5,
    nprobe: int = 8,
    shortlist: int = 128,
    m: int = 4,
    dims: int = 64,
    exact: bool = False,
) -> DataFrame:
    """IVF-PQ query against a persisted index: probe cells are collected
    (a bounded |Q|·nprobe id list), pushed as a partition filter on the
    cells table (directory pruning), then the standard ADC + re-rank
    runs over only the probed partitions."""
    from python_cdc_spark.operators.pq import ivf_pq_topk
    from python_cdc_spark.operators.similarity import kmeans_assign

    idx = load_ivfpq_index(spark, index_dir)
    probes = kmeans_assign(
        queries, idx["centroids"], id_col, vec_col,
        exact=exact, n_best=nprobe, dims=dims,
    ).select(F.col(id_col).alias("query_id"), "cell")
    # bounded collect: |Q|·nprobe cell ids → a literal IN-list the scan
    # can prune directories with (PartitionFilters, not post-scan filter)
    touched = sorted({int(r["cell"]) for r in probes.select("cell").distinct().collect()})
    cells = idx["cells"].filter(F.col("cell").isin(touched))
    assigned = cells.select("neighbor_id", "cell").distinct()
    codes = cells.select(
        F.col("neighbor_id").alias(id_col), "sub", "code"
    )
    return ivf_pq_topk(
        corpus, idx["centroids"], assigned, codes, idx["codebook"], queries,
        id_col, vec_col, k_top=k_top, nprobe=nprobe, shortlist=shortlist,
        m=m, dims=dims, exact=exact,
    )
