"""Streaming corpus dedup: documents arrive as a stream, the near-dup
index folds every micro-batch.

``StreamingCorpusDedup`` wires Structured Streaming's file source to
``operators/incremental_dedup``: each ``foreachBatch`` delta generates
candidates only against the persisted band index, verifies with exact
Jaccard, and merges clusters over the contracted graph — so per-batch
work scales with the batch, and the components table is always the
exact result a batch rerun over everything-so-far would produce
(pinned by ``test_streaming_corpus_dedup_matches_batch``).

Restart semantics ride the Structured Streaming checkpoint: a batch is
folded exactly once per checkpoint commit. The fold itself appends to
the index BEFORE the checkpoint commits, so a crash between the two
can replay a batch — callers needing exact-once under crash should
dedup batch ids like ``streaming/state_store.py`` does (this wrapper
keeps the streaming surface thin; the contracted-merge math is
idempotent only per unique batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from python_cdc_spark.operators.incremental_dedup import (
    build_dedup_index,
    incremental_dedup_update,
)


class StreamingCorpusDedup:
    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.index_path = index_path
        self.text_col = text_col
        self.id_col = id_col

    def bootstrap(self, docs: DataFrame) -> None:
        """Seed the index from an existing corpus (batch build)."""
        build_dedup_index(
            self.spark, docs, self.index_path, self.text_col, self.id_col
        )

    def fold_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        if not batch.isEmpty():
            incremental_dedup_update(
                self.spark, self.index_path, batch, self.text_col, self.id_col
            )

    def components(self) -> DataFrame:
        """Current (v, component) clusters — exact as of the last fold."""
        return self.spark.read.parquet(
            os.path.join(self.index_path, "components")
        )

    def start(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        """Attach to a streaming DataFrame of documents."""
        writer = (
            stream.writeStream.option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.fold_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
