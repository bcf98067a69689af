"""Incremental near-dup maintenance: index once, process deltas.

At 100 TB you cannot re-run corpus dedup from scratch every time a
crawl lands — the batch pipeline's gram/band tables ARE an index, so
persist them and process only the delta:

- candidate pairs = delta bands vs (index ∪ delta) bands — old↔old
  pairs are never re-examined (their connectivity already lives in the
  stored components);
- verification = exact Jaccard over gram cells, same threshold as the
  batch path;
- cluster merge = connected components over the CONTRACTED graph: old
  clusters participate as their canonical id (one super-node each), so
  the iterative closure touches only components the delta actually
  connects to — work scales with the delta, not the corpus.

``test_incremental_dedup_matches_batch`` pins the contract: any split
of the corpus into base + deltas yields byte-identical components to
the one-shot batch run.

Storage layout under ``path`` (all parquet):
  cells/       (id, gram)          — the verification inverted index
  bands/       (id, band_id, band_key) — the LSH candidate index
  sizes/       (id, set_size)      — gram-set sizes
  components/  (v, component)      — current non-singleton clusters
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.operators.components import connected_components
from python_cdc_spark.operators.dedup import _gram_cells, minhash_signatures

_N, _K, _BANDS, _THRESHOLD = 3, 8, 4, 0.5


def _band_stack(sigs: DataFrame, k: int = _K, bands: int = _BANDS) -> DataFrame:
    """(id, band_id, band_key) — the banded LSH index rows."""
    r = k // bands
    band_keys = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("id", *band_keys)
    return banded.select(
        "id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(b) for b in range(bands)]),
                F.array(*[F.col(f"band_{b}") for b in range(bands)]),
            )
        ).alias("band_id", "band_key"),
    )


def _verify_pairs(
    cand: DataFrame, cells: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard disposal of candidate (id_a, id_b) pairs."""
    ga = cells.select(F.col("id").alias("id_a"), "gram")
    gb = cells.select(F.col("id").alias("gb_id"), F.col("gram").alias("gram_b"))
    shared = (
        cand.join(ga, "id_a")
        .join(
            gb,
            (F.col("id_b") == F.col("gb_id")) & (F.col("gram") == F.col("gram_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    jac = F.col("shared").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("shared")
    ).cast("double")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b")
    )


def _delta_tables(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    cells = _gram_cells(docs, text_col, id_col, _N).localCheckpoint(eager=False)
    sigs = minhash_signatures(
        docs, text_col, id_col, n=_N, k=_K, one_permutation=True, cells=cells
    )
    bands = _band_stack(sigs)
    sizes = cells.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    return cells, bands, sizes


def build_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Batch bootstrap: gram/band/size tables + initial components."""
    cells, bands, sizes = _delta_tables(docs, text_col, id_col)
    cells.write.mode("overwrite").parquet(os.path.join(path, "cells"))
    bands.write.mode("overwrite").parquet(os.path.join(path, "bands"))
    sizes.write.mode("overwrite").parquet(os.path.join(path, "sizes"))
    b = spark.read.parquet(os.path.join(path, "bands"))
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    cells_r = spark.read.parquet(os.path.join(path, "cells"))
    sizes_r = spark.read.parquet(os.path.join(path, "sizes"))
    pairs = _verify_pairs(cand, cells_r, sizes_r, _THRESHOLD)
    comp = connected_components(pairs, "id_a", "id_b")
    comp.write.mode("overwrite").parquet(os.path.join(path, "components"))


def incremental_dedup_update(
    spark: SparkSession,
    path: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fold a delta into the index; returns the UPDATED (v, component)
    mapping (non-singletons only, canonical = cluster-min id — the same
    shape ``connected_components`` returns for a batch run).

    The only corpus-wide work is two index reads joined ON KEY (band
    key, gram); everything iterative runs on the contracted graph."""
    d_cells, d_bands, d_sizes = _delta_tables(delta_docs, text_col, id_col)
    d_cells = d_cells.localCheckpoint(eager=False)
    d_bands = d_bands.localCheckpoint(eager=False)
    old_cells = spark.read.parquet(os.path.join(path, "cells"))
    old_bands = spark.read.parquet(os.path.join(path, "bands"))
    old_sizes = spark.read.parquet(os.path.join(path, "sizes"))
    old_comp = spark.read.parquet(os.path.join(path, "components"))

    all_bands = old_bands.unionByName(d_bands)
    # candidates touching the delta: delta side x full band index
    cand = (
        d_bands.alias("x")
        .join(
            all_bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") != F.col("y.id")),
        )
        .select(
            F.least(F.col("x.id"), F.col("y.id")).alias("id_a"),
            F.greatest(F.col("x.id"), F.col("y.id")).alias("id_b"),
        )
        .distinct()
    )
    all_cells = old_cells.unionByName(d_cells)
    all_sizes = old_sizes.unionByName(d_sizes)
    new_pairs = _verify_pairs(cand, all_cells, all_sizes, _THRESHOLD)

    # contract: old ids participate as their canonical
    def canon(df: DataFrame, col: str) -> DataFrame:
        m = old_comp.select(
            F.col("v").alias(col), F.col("component").alias(f"__c_{col}")
        )
        return df.join(m, col, "left").withColumn(
            col, F.coalesce(F.col(f"__c_{col}"), F.col(col))
        ).drop(f"__c_{col}")

    contracted = canon(canon(new_pairs, "id_a"), "id_b").filter(
        F.col("id_a") != F.col("id_b")
    )
    merged = connected_components(contracted, "id_a", "id_b")
    # compose: every doc's old canonical re-maps through the merge
    m = merged.select(F.col("v").alias("component"), F.col("component").alias("__new"))
    composed_old = (
        old_comp.join(m, "component", "left")
        .select("v", F.coalesce(F.col("__new"), F.col("component")).alias("component"))
    )
    # vertices NEW to the component table: delta docs in a pair, plus
    # old singletons a delta doc just connected to (they were never in
    # old_comp — ``canon`` left them uncontracted). Root self-rows stay,
    # matching the batch ``connected_components`` output shape.
    new_members = merged.join(old_comp.select(F.col("v")), "v", "left_anti")
    new_comp = composed_old.unionByName(new_members.select("v", "component"))

    # fold the delta into the persisted index (append) and swap components
    d_cells.write.mode("append").parquet(os.path.join(path, "cells"))
    d_bands.write.mode("append").parquet(os.path.join(path, "bands"))
    d_sizes.write.mode("append").parquet(os.path.join(path, "sizes"))
    new_comp = new_comp.localCheckpoint(eager=True)  # sever lineage before swap
    tmp = os.path.join(path, "components.tmp")
    new_comp.write.mode("overwrite").parquet(tmp)
    import shutil

    final = os.path.join(path, "components")
    shutil.rmtree(final)
    os.rename(tmp, final)
    return new_comp
