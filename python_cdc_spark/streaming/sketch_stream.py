"""Streaming sketch maintenance: HLL registers and count-min counters
folded per micro-batch.

The batch sketches (``queries/sketches.py``) exist because register /
counter state is a *mergeable partial aggregate*; this module is the
streaming consequence: a keyed stream folds into O(m) + O(d·w) rows of
persistent state per micro-batch, and the distinct / frequency
estimates are always available without rescanning history. That is the
100 TB stream-analytics shape — state size is independent of stream
length.

Fold algebra (both are idempotent-by-replay when guarded by the meta
pointer below):

- HLL:  new_registers = (old ∪ batch) groupBy bucket -> max(rho)
- CM:   new_counters  = (old ∪ batch) groupBy (row, bucket) -> sum(n)

Restart semantics: each fold writes a NEW version directory
(``v<N>``; a leftover directory from a crashed attempt is deleted and
rewritten — the write is deterministic), then commits by atomically
replacing ``_meta.json`` = {version, folded batch ids} in ONE
``os.replace``. Version and replay guard travel together, so a crash
on either side of the commit point leaves a state where the batch is
either wholly unfolded (replay refolds from the OLD version) or wholly
folded (replay is skipped) — counters can never double-count. The
previous version survives one generation so a concurrent reader never
races a deletion.

Single writer; ``state_path`` must be a LOCAL filesystem path (markers
use ``os`` primitives while parquet goes through Spark's Hadoop FS —
same constraint as ``streaming/state_store.py`` and the dedup index).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.queries.sketches import _GOLD, _mix32

#: On-disk sketch-state format. Bumped when the hash geometry (or any
#: register/bucket placement rule) changes, because persisted registers
#: from an older geometry CANNOT be merged with new placements — the
#: mix would silently corrupt estimates. v2 = low-32-bit key mask
#: before _mix32 (r6); v1 (implicit, no "format" key) = unmasked.
_HLL_CM_FORMAT = 2
#: KLL buffer layout version (value/rowid buffers, no key hashing).
_KLL_FORMAT = 1


def _check_format(meta: dict, want: int, state_path: str) -> dict:
    """Refuse to resume state written under a different sketch format:
    folding new-geometry updates into old-geometry registers never
    errors but double-places keys (ADVICE r6 #5). The caller must
    rebuild (delete the state dir or point at a fresh one)."""
    have = meta.get("format", 1)
    if meta.get("version", 0) > 0 and have != want:
        raise ValueError(
            f"sketch state at {state_path} was written with format "
            f"v{have}, this build writes v{want}: register/bucket "
            "placements are incompatible — delete the state directory "
            "(or use a fresh path) and re-fold from the source stream"
        )
    return meta


class StreamingSketchAggregator:
    """Maintains one HLL (distinct keys) and one count-min sketch
    (key frequencies) over a bigint key column of a stream.

    Keys may be ANY bigint: the key is masked to its low 32 bits
    (``& 0xFFFFFFFF``) before hashing, because ``_mix32`` is defined
    over non-negative inputs (Spark's ``%`` keeps the dividend's sign,
    so an unmasked negative key would produce negative buckets and
    garbage estimates that still merge deterministically). The mask is
    the identity for non-negative keys below 2^32 and folds larger /
    negative keys into the hash domain consistently on build and probe.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_col: str,
        p_bits: int = 8,
        cm_d: int = 4,
        cm_w: int = 1024,
    ):
        self.spark = spark
        self.state_path = state_path
        self.key_col = key_col
        self.p_bits = p_bits
        self.m = 1 << p_bits
        self.cm_d = cm_d
        self.cm_w = cm_w
        os.makedirs(state_path, exist_ok=True)

    # -- meta pointer (atomic commit of version + replay guard) --------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_path, "_meta.json")

    def _meta(self) -> dict:
        try:
            with open(self._meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return {"version": 0, "folded": []}
        return _check_format(meta, _HLL_CM_FORMAT, self.state_path)

    def _commit(self, version: int, folded: list) -> None:
        # Spark only replays recent uncommitted batches, so the replay
        # guard needs a bounded tail, not every id since stream birth
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "folded": sorted(folded)[-1000:],
                    "format": _HLL_CM_FORMAT,
                },
                f,
            )
        os.replace(tmp, self._meta_path)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.state_path, f"v{version}")

    # -- sketch construction -------------------------------------------

    def _key(self):
        # low-32-bit mask: keeps _mix32's input non-negative for any
        # bigint key (see class docstring)
        return F.col(self.key_col).bitwiseAND(F.lit((1 << 32) - 1))

    def _batch_hll(self, df: DataFrame) -> DataFrame:
        h = df.select(_mix32(self._key()).alias("h"))
        rest_bits = 32 - self.p_bits
        w = F.shiftright(F.col("h"), self.p_bits)
        return (
            h.select(
                (F.col("h") % self.m).alias("bucket"),
                F.when(w == 0, F.lit(rest_bits + 1))
                .otherwise(F.lit(rest_bits + 1) - F.length(F.bin(w)))
                .alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").cast("int").alias("r"))
        )

    def _batch_cm(self, df: DataFrame) -> DataFrame:
        cells = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            (
                                _mix32(self._key() + F.lit(i * _GOLD))
                                % self.cm_w
                            ).alias("bucket"),
                        )
                        for i in range(self.cm_d)
                    ]
                )
            ).alias("cell")
        ).select("cell.i", "cell.bucket")
        return cells.groupBy("i", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )

    # -- fold -----------------------------------------------------------

    def fold_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        meta = self._meta()
        if batch_id is not None and batch_id in meta["folded"]:
            return  # checkpoint replay after a crash past the commit
        if batch.isEmpty():
            if batch_id is not None:
                self._commit(meta["version"], meta["folded"] + [batch_id])
            return
        hll_new = self._batch_hll(batch)
        cm_new = self._batch_cm(batch)
        cur = meta["version"]
        if cur > 0:
            old = self._vdir(cur)
            hll_new = (
                self.spark.read.schema("bucket long, r int")
                .parquet(os.path.join(old, "hll"))
                .unionAll(hll_new)
                .groupBy("bucket")
                .agg(F.max("r").cast("int").alias("r"))
            )
            cm_new = (
                self.spark.read.schema("i int, bucket long, n long")
                .parquet(os.path.join(old, "cm"))
                .unionAll(cm_new)
                .groupBy("i", "bucket")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        nxt = cur + 1
        out = self._vdir(nxt)
        if os.path.exists(out):  # crashed attempt: rewrite deterministically
            shutil.rmtree(out)
        hll_new.coalesce(1).write.parquet(os.path.join(out, "hll"))
        cm_new.coalesce(1).write.parquet(os.path.join(out, "cm"))
        folded = meta["folded"] + ([batch_id] if batch_id is not None else [])
        self._commit(nxt, folded)
        # sweep EVERY version older than the previous one (not just
        # cur-1): a crash between a past commit and its cleanup must not
        # leak an orphaned directory for the stream's lifetime
        for entry in os.listdir(self.state_path):
            if (
                entry.startswith("v")
                and entry[1:].isdigit()
                and int(entry[1:]) < nxt - 1
            ):
                shutil.rmtree(os.path.join(self.state_path, entry))

    # -- reads ----------------------------------------------------------

    def registers(self) -> DataFrame:
        v = self._meta()["version"]
        if v == 0:
            return self.spark.createDataFrame([], "bucket long, r int")
        return self.spark.read.schema("bucket long, r int").parquet(
            os.path.join(self._vdir(v), "hll")
        )

    def counters(self) -> DataFrame:
        v = self._meta()["version"]
        if v == 0:
            return self.spark.createDataFrame([], "i int, bucket long, n long")
        return self.spark.read.schema("i int, bucket long, n long").parquet(
            os.path.join(self._vdir(v), "cm")
        )

    def distinct_estimate(self) -> float:
        """Raw HLL estimate from the current registers (same estimator
        as sketch_hll_orderkeys; valid while n/m is in the raw range)."""
        m = float(self.m)
        row = (
            self.registers()
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.sum(
                    F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), r)")
                ).alias("s"),
            )
            .collect()[0]
        )
        if not row["b"]:
            return 0.0
        alpha = 0.7213 / (1.0 + 1.079 / m)
        return alpha * m * m / (row["s"] + (m - row["b"]))

    def frequency_estimate(self, keys: DataFrame) -> DataFrame:
        """Count-min point estimates (min over rows) for a key table —
        broadcast probe against the d·w counter cells."""
        probes = keys.select(
            F.col(self.key_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            (
                                _mix32(self._key() + F.lit(i * _GOLD))
                                % self.cm_w
                            ).alias("bucket"),
                        )
                        for i in range(self.cm_d)
                    ]
                )
            ).alias("cell"),
        ).select(self.key_col, "cell.i", "cell.bucket")
        return (
            F.broadcast(probes)
            .join(self.counters(), ["i", "bucket"])
            .groupBy(self.key_col)
            .agg(F.min("n").cast("long").alias("cm_estimate"))
        )

    # -- streaming attach ----------------------------------------------

    def start(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream.writeStream.option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.fold_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class KllStreamSketch:
    """Mergeable streaming quantile sketch (KLL-style level buffers).

    State is per-(bucket, level) buffers of (value, rid) pairs: an item
    at level L carries weight 2^L. A batch lands at level 0; any buffer
    exceeding ``k`` items compacts deterministically — sort by
    (value, rid), keep the even indices (0-based), promote them one
    level (weight doubles) — repeating until every buffer fits. Rank
    error grows by at most the promoted weight per compaction, the
    classic KLL bound shape, while total state stays O(buckets × k ×
    log(n/k)) rows regardless of stream length.

    Unlike the HLL/CM state (pure register/counter algebra), KLL
    compaction is HISTORY-DEPENDENT: which items survive depends on the
    batch boundaries, so a streamed fold is a different — equally valid,
    equally bounded — sketch than a one-shot fold over the union. Tests
    therefore pin both against the EXACT quantiles within the error
    bound (plus replay/crash semantics), not bit-equality; the
    oracle-replayable bit-exact variant is the batch query
    ``sketch_kll_quantiles`` (fixed one-shot compaction depth).

    Restart semantics are identical to :class:`StreamingSketchAggregator`
    (same versioned dirs + atomic meta commit + replay guard + GC sweep).
    Single writer; ``state_path`` must be LOCAL.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        value_col: str,
        id_col: str,
        k: int = 256,
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.state_path = state_path
        self.value_col = value_col
        self.id_col = id_col
        self.k = k
        self.n_buckets = n_buckets
        os.makedirs(state_path, exist_ok=True)

    # meta pointer: shares the aggregator's layout
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_path, "_meta.json")

    def _meta(self) -> dict:
        try:
            with open(self._meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return {"version": 0, "folded": []}
        return _check_format(meta, _KLL_FORMAT, self.state_path)

    def _commit(self, version: int, folded: list) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "folded": sorted(folded)[-1000:],
                    "format": _KLL_FORMAT,
                },
                f,
            )
        os.replace(tmp, self._meta_path)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.state_path, f"v{version}")

    def state(self) -> DataFrame:
        v = self._meta()["version"]
        if v == 0:
            return self.spark.createDataFrame(
                [], "bucket long, level int, v double, rid long"
            )
        return self.spark.read.schema(
            "bucket long, level int, v double, rid long"
        ).parquet(self._vdir(v))

    def _compact(self, st: DataFrame) -> DataFrame:
        """Apply the even-index promotion until every (bucket, level)
        buffer holds <= k items. Each pass is one DataFrame op over the
        sketch-sized state; the count check is metadata-scale."""
        from pyspark.sql import Window

        st = st.localCheckpoint(eager=True)
        while True:
            over = {
                (r["bucket"], r["level"])
                for r in st.groupBy("bucket", "level")
                .count()
                .filter(F.col("count") > self.k)
                .collect()
            }
            if not over:
                return st
            is_over = F.concat_ws(
                ":", F.col("bucket"), F.col("level")
            ).isin([f"{b}:{l}" for b, l in over])
            w = Window.partitionBy("bucket", "level").orderBy("v", "rid")
            marked = st.withColumn("rn", F.row_number().over(w) - 1)
            keep = marked.filter(~is_over).drop("rn")
            promoted = (
                marked.filter(is_over & (F.col("rn") % 2 == 0))
                .drop("rn")
                .withColumn("level", F.col("level") + F.lit(1))
            )
            st = keep.unionByName(promoted).localCheckpoint(eager=True)

    def fold_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        meta = self._meta()
        if batch_id is not None and batch_id in meta["folded"]:
            return  # checkpoint replay after a crash past the commit
        if batch.isEmpty():
            if batch_id is not None:
                self._commit(meta["version"], meta["folded"] + [batch_id])
            return
        new0 = batch.select(
            (
                _mix32(F.col(self.id_col).bitwiseAND(F.lit((1 << 32) - 1)))
                % self.n_buckets
            ).alias("bucket"),
            F.lit(0).cast("int").alias("level"),
            F.col(self.value_col).cast("double").alias("v"),
            F.col(self.id_col).cast("long").alias("rid"),
        )
        cur = meta["version"]
        st = self.state().unionByName(new0) if cur > 0 else new0
        st = self._compact(st)
        nxt = cur + 1
        out = self._vdir(nxt)
        if os.path.exists(out):  # crashed attempt: rewrite deterministically
            shutil.rmtree(out)
        st.coalesce(1).write.parquet(out)
        folded = meta["folded"] + ([batch_id] if batch_id is not None else [])
        self._commit(nxt, folded)
        for entry in os.listdir(self.state_path):
            if (
                entry.startswith("v")
                and entry[1:].isdigit()
                and int(entry[1:]) < nxt - 1
            ):
                shutil.rmtree(os.path.join(self.state_path, entry))

    def quantile_estimates(self, qs: list[float]) -> dict[float, float]:
        """Weighted-rank estimates from the current state. The state is
        sketch-sized (O(buckets × k × levels)), so the final scan runs
        at the driver on collected rows — the same metadata-scale
        finish as the batch query's survivor pass."""
        rows = sorted(
            (r["v"], r["rid"], 1 << r["level"]) for r in self.state().collect()
        )
        if not rows:
            return {q: float("nan") for q in qs}
        import math

        total = sum(w for _, _, w in rows)
        out = {}
        for q in qs:
            target = max(1, math.ceil(q * total))
            cw = 0
            for v, _, w in rows:
                cw += w
                if cw >= target:
                    out[q] = v
                    break
        return out

    def start(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream.writeStream.option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.fold_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class MgStreamSketch:
    """Streaming Misra-Gries summary: the frequent-items member of the
    streaming sketch family (batch twin: ``operators/heavy_hitters.py``).

    State is the MG summary itself — at most ``capacity`` (key, c)
    rows. Each micro-batch folds by counter merge (batch groupBy-count
    ∪ old summary → sum per key) followed by the batched MG decrement:
    when the merged summary exceeds capacity, the (capacity+1)-th
    largest count is subtracted from every counter and non-positive
    counters drop. MG summaries are MERGEABLE (Agarwal et al.,
    "Mergeable Summaries"): the merged undercount is at most
    Σ N_batch/(capacity+1) = N_total/(capacity+1), so after any number
    of micro-batches ``candidates()`` still contains EVERY key whose
    stream-lifetime frequency exceeds N/(capacity+1) — the same
    guarantee the batch operator gets in one pass, which makes
    stream-candidates + exact recount equal a batch
    ``exact_heavy_hitters`` over the same data (pinned).

    The decrement threshold is read from a ``limit(capacity+1)``
    collect — ≤513 rows, metadata-scale — and the state write is
    summary-sized; per-batch cost is O(batch + capacity) regardless of
    stream length. ``total()`` tracks the folded item count for
    threshold arithmetic.

    Restart semantics are identical to
    :class:`StreamingSketchAggregator` (versioned dirs + atomic meta
    commit carrying the replay guard AND the running total, so a
    crash-replay can neither double-count the summary nor the total).
    Single writer; ``state_path`` must be LOCAL.

    KEY-TYPE COERCION: the persisted summary schema is fixed at
    ``{key_col} string, c long`` and ``fold_batch`` casts the key to
    string, so a non-string key column round-trips as its string
    rendering — ``candidates()`` returns STRING keys, and a recount
    join back to the source column needs a caller-side
    ``cast('string')`` on the source (the pinned batch-equivalence test
    does exactly that). Derive-from-input-type (as the batch
    ``mg_candidates`` does) would make the state schema depend on the
    first stream attached; a fixed string schema keeps restarts
    schema-stable across callers.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_col: str,
        capacity: int = 512,
    ):
        self.spark = spark
        self.state_path = state_path
        self.key_col = key_col
        self.capacity = capacity
        os.makedirs(state_path, exist_ok=True)

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_path, "_meta.json")

    def _meta(self) -> dict:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"version": 0, "folded": [], "n_total": 0}

    def _commit(self, version: int, folded: list, n_total: int) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "folded": sorted(folded)[-1000:],
                    "n_total": int(n_total),
                },
                f,
            )
        os.replace(tmp, self._meta_path)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.state_path, f"v{version}")

    def summary(self) -> DataFrame:
        """(key, c) — MG lower-bound counters, ≤ capacity rows."""
        v = self._meta()["version"]
        if v == 0:
            return self.spark.createDataFrame([], f"{self.key_col} string, c long")
        return self.spark.read.schema(f"{self.key_col} string, c long").parquet(
            self._vdir(v)
        )

    def candidates(self) -> DataFrame:
        """Keys guaranteed to include every item with lifetime
        frequency > total()/(capacity+1)."""
        return self.summary().select(self.key_col)

    def total(self) -> int:
        """Items folded so far (crash-consistent with the summary)."""
        return int(self._meta()["n_total"])

    def fold_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        meta = self._meta()
        if batch_id is not None and batch_id in meta["folded"]:
            return  # checkpoint replay after a crash past the commit
        if batch.isEmpty():
            if batch_id is not None:
                self._commit(meta["version"], meta["folded"] + [batch_id], meta["n_total"])
            return
        bc = batch.select(F.col(self.key_col).cast("string").alias(self.key_col))
        n_batch = bc.count()
        merged = bc.groupBy(self.key_col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        cur = meta["version"]
        if cur > 0:
            merged = (
                self.summary()
                .unionByName(merged)
                .groupBy(self.key_col)
                .agg(F.sum("c").cast("long").alias("c"))
            )
        merged = merged.localCheckpoint(eager=True)
        if merged.count() > self.capacity:
            # the (capacity+1)-th largest count, deterministic tiebreak;
            # ≤ capacity+1 collected rows — metadata-scale
            head = merged.orderBy(F.desc("c"), F.asc(self.key_col)).limit(
                self.capacity + 1
            ).collect()
            sub = int(head[-1]["c"])
            merged = merged.filter(F.col("c") > sub).select(
                self.key_col, (F.col("c") - sub).cast("long").alias("c")
            )
        nxt = cur + 1
        out = self._vdir(nxt)
        if os.path.exists(out):  # crashed attempt: rewrite deterministically
            shutil.rmtree(out)
        merged.coalesce(1).write.parquet(out)
        folded = meta["folded"] + ([batch_id] if batch_id is not None else [])
        self._commit(nxt, folded, meta["n_total"] + n_batch)
        for entry in os.listdir(self.state_path):
            if (
                entry.startswith("v")
                and entry[1:].isdigit()
                and int(entry[1:]) < nxt - 1
            ):
                shutil.rmtree(os.path.join(self.state_path, entry))

    def start(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream.writeStream.option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.fold_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
