"""Streaming rollup maintenance: a continuously-fresh materialized cube.

Wires Structured Streaming's micro-batches to
``plans/rollup.RollupCatalog.refresh``: every batch of new fact rows
folds into the cube's partials (sum/count by SUM, min/max by MIN/MAX,
HLL registers by MAX), so dashboard queries — including approximate
COUNT DISTINCT via the sketch measure — answer from a table that is
always current and always metadata-scale. This is the streaming
materialized-view shape: per-batch work is O(delta + cube), and a
``rewrite`` between batches never blocks on the fold thanks to the
catalog's versioned storage.

Restart semantics are inherited from the catalog, not bolted on: the
version pointer and the folded-batch-id replay guard commit together
in one atomic ``os.replace`` (``plans/rollup.py``), so a crash between
the fold and the streaming checkpoint replays the batch as a no-op —
the cube can never double-count. Complements
``streaming/ivm_stream.py`` (signed-delta IVM over the crash-atomic
state store, which also handles updates/deletes for sum/count): this
path is insert-only facts but adds min/max and sketch measures.

Single writer per rollup name; ``base_dir`` must be a LOCAL path
(same constraint as the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_cdc_spark.plans.rollup import RollupCatalog


class StreamingRollupMaintenance:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        name: str,
        dims: dict[str, str],
        measures: dict[str, tuple[str, str]],
    ):
        self.catalog = RollupCatalog(spark, base_dir)
        self.name = name
        self.dims = dims
        self.measures = measures

    def bootstrap(self, src: DataFrame, fingerprint: str = "") -> None:
        """Seed the cube from the existing fact table (batch build)."""
        self.catalog.define(
            self.name, src, self.dims, self.measures, fingerprint=fingerprint
        )

    def fold_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        if batch.isEmpty():
            return
        self.catalog.refresh(self.name, batch, batch_id=batch_id)

    def rewrite(self, dims, measures, predicate=None, predicate_dims=None):
        """Query the live cube (delegates to the catalog's rewrite)."""
        return self.catalog.rewrite(dims, measures, predicate, predicate_dims)

    def start(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        """Attach to a streaming DataFrame of fact rows."""
        writer = (
            stream.writeStream.option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.fold_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
