"""Crash-safety pins for the incremental dedup index (ADVICE r4):
partial delta dirs are invisible and pruned, a committed-but-unswapped
fold replays to a fixpoint, the components swap never leaves the index
table-less, and compaction is atomic at the base pointer."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.operators.incremental_dedup import (
    build_dedup_index,
    compact_dedup_index,
    incremental_dedup_update,
    read_components,
    read_index_table,
    _committed_delta_dirs,
    _deltas_root,
)


@pytest.fixture()
def corpus(spark):
    return table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )


def _comp_set(spark, idx):
    return sorted(map(tuple, read_components(spark, idx).collect()))


def test_partial_delta_dir_is_invisible_and_pruned(spark, corpus, tmp_path):
    """Simulate a crash mid-fold: a delta subdirectory WITHOUT the
    _COMMITTED marker must not contribute to index reads, and the next
    fold must delete it."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus.filter(F.col("doc_id") < 300), idx)
    n0 = read_index_table(spark, idx, "cells").count()

    # fake partial: copy a committed-fold's shape but omit the marker
    partial = os.path.join(_deltas_root(idx), "crashed")
    corpus.filter(F.col("doc_id") >= 450).limit(10).select(
        F.col("doc_id").alias("id"), F.lit("g").alias("gram")
    ).write.parquet(os.path.join(partial, "cells"))
    assert read_index_table(spark, idx, "cells").count() == n0
    assert _committed_delta_dirs(idx) == []

    incremental_dedup_update(
        spark, idx, corpus.filter(F.col("doc_id") >= 300)
    )
    assert not os.path.exists(partial)


def test_refold_after_commit_before_swap_is_fixpoint(spark, corpus, tmp_path):
    """Crash after the delta committed but before (or after) the
    components swap: re-running the SAME fold must leave components and
    index contents identical — no duplicated gram cells, no double
    sizes rows."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus.filter(F.col("doc_id") < 300), idx)
    delta = corpus.filter(F.col("doc_id") >= 300)
    incremental_dedup_update(spark, idx, delta)
    comps = _comp_set(spark, idx)
    cells = read_index_table(spark, idx, "cells").count()
    sizes = read_index_table(spark, idx, "sizes").count()
    # replay (content-derived tag → same directory, delete-then-rewrite)
    incremental_dedup_update(spark, idx, delta)
    assert _comp_set(spark, idx) == comps
    assert read_index_table(spark, idx, "cells").count() == cells
    assert read_index_table(spark, idx, "sizes").count() == sizes


def test_components_swap_keeps_previous_version(spark, corpus, tmp_path):
    """The swap writes v<N+1> then repoints; the previous version must
    survive one generation so a racing reader never sees a missing
    directory (ADVICE r4: rmtree-then-rename window)."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus.filter(F.col("doc_id") < 300), idx)
    assert os.path.isdir(os.path.join(idx, "components_v0"))
    incremental_dedup_update(
        spark, idx, corpus.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    )
    # both the new and the immediately-previous version exist
    assert os.path.isdir(os.path.join(idx, "components_v1"))
    assert os.path.isdir(os.path.join(idx, "components_v0"))
    incremental_dedup_update(spark, idx, corpus.filter(F.col("doc_id") >= 400))
    assert os.path.isdir(os.path.join(idx, "components_v2"))
    assert os.path.isdir(os.path.join(idx, "components_v1"))
    assert not os.path.isdir(os.path.join(idx, "components_v0"))  # pruned


def test_compaction_preserves_reads_and_results(spark, corpus, tmp_path):
    """Compacting deltas into a new base must not change index reads or
    subsequent folds; a crash between the pointer swap and the cleanup
    leaves a readable, non-duplicated index."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus.filter(F.col("doc_id") < 250), idx)
    incremental_dedup_update(
        spark, idx, corpus.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400))
    )
    cells = read_index_table(spark, idx, "cells").count()
    comps = _comp_set(spark, idx)
    assert len(_committed_delta_dirs(idx)) == 1
    n = compact_dedup_index(spark, idx)
    assert n == 1
    assert read_index_table(spark, idx, "cells").count() == cells
    assert _comp_set(spark, idx) == comps
    assert _committed_delta_dirs(idx) == []
    # folds keep working on the compacted base, same final answer as
    # an uncompacted sibling index
    final_a = incremental_dedup_update(
        spark, idx, corpus.filter(F.col("doc_id") >= 400)
    )
    idx_b = str(tmp_path / "idx_b")
    build_dedup_index(spark, corpus.filter(F.col("doc_id") < 250), idx_b)
    incremental_dedup_update(
        spark, idx_b, corpus.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400))
    )
    final_b = incremental_dedup_update(
        spark, idx_b, corpus.filter(F.col("doc_id") >= 400)
    )
    assert sorted(map(tuple, final_a.collect())) == sorted(
        map(tuple, final_b.collect())
    )


def test_compaction_crash_before_cleanup_is_consistent(spark, corpus, tmp_path):
    """Simulate the compaction crash window: pointer swapped, absorbed
    delta dirs still on disk. Reads must exclude them (no duplicates);
    the next fold prunes them and the includes list."""
    from python_cdc_spark.operators.incremental_dedup import _read_base_ptr

    idx = str(tmp_path / "idx")
    build_dedup_index(spark, corpus.filter(F.col("doc_id") < 250), idx)
    incremental_dedup_update(
        spark, idx, corpus.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400))
    )
    delta_dir = _committed_delta_dirs(idx)[0]
    tag = os.path.basename(delta_dir)
    keep = str(tmp_path / "keep_delta")
    shutil.copytree(delta_dir, keep)
    cells = read_index_table(spark, idx, "cells").count()
    compact_dedup_index(spark, idx)
    # resurrect the absorbed dir as if cleanup never ran
    shutil.copytree(keep, delta_dir)
    ptr = _read_base_ptr(idx)
    assert tag in ptr["includes"]
    assert read_index_table(spark, idx, "cells").count() == cells  # no dupes
    # next fold prunes the stale dir and clears the includes entry
    incremental_dedup_update(spark, idx, corpus.filter(F.col("doc_id") >= 400))
    assert not os.path.exists(delta_dir)
    assert tag not in _read_base_ptr(idx)["includes"]
