"""Streaming apply-changes: continuous CDC materialization (E18 + E24).

Replaces the reference's print-only workers (``cdc_consumer.py:43-74``)
with a real incremental state sink. Per micro-batch, ``foreachBatch``
merges the batch's events into a persistent keyed state table:

    state ⊎ batch = apply_changes(state-as-events ∪ batch-events)

Exactly-once story (the reference acks BEFORE processing → at-most-once,
``postgre_cdc_consumer.py:98-99``; we upgrade): the streaming checkpoint
replays an uncommitted batch after a crash, and the merge is idempotent
— replaying the same events cannot change the folded state (per-key
max-lsn semantics), so replay converges. Each state write commits
atomically through :class:`~python_cdc_spark.streaming.state_store.
BucketedStateStore` (immutable version dirs + manifest swap) — a crash
mid-write leaves the previous state intact; a transactional table
format (Delta/Iceberg MERGE) remains the managed-production upgrade.

Scale design: state is hash-bucketed on key into ``n_buckets``
partitions; a micro-batch rewrites ONLY the buckets its keys touch
(the store reads and commits per-bucket directories), so per-batch cost
is O(batch + touched_state), not O(total_state).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from python_cdc_spark.cdc.apply import (
    apply_changes_with_tombstones,
    apply_changes_with_tombstones_multi,
    merge_state_with_batch,
    state_as_events,
)
from python_cdc_spark.streaming.state_store import BucketedStateStore

#: table-identity columns carried through the merge when the feed has
#: them — they scope TRUNCATE expansion (and the state fold) per table
_AUX_COLS = ("schema", "table")

#: Wire micro-batches at or above this row count are repartitioned to
#: executor parallelism before the Python frame decode (a file-source
#: batch has only file-count partitions). Below it the shuffle's fixed
#: cost beats the decode win — latency-sized batches stay zero-copy.
_WIDE_DECODE_ROWS = 200_000

#: Bytes-based twin of the row gate, decided from the batch's SOURCE
#: FILE SIZES (driver metadata) BEFORE the batch is materialized — a
#: huge batch never has to be checkpointed at file-count width just to
#: count its rows. 3 MiB ≈ the row gate's 200k events at the measured
#: ~14 B/row parquet footprint of encoded I/U/D frames; non-file
#: sources (no input files to size) fall back to the row gate.
_WIDE_DECODE_BYTES = 3 * 1024 * 1024


def _stat_uris(files: list[str]) -> int | None:
    """Sum of on-disk sizes for file:// (or bare-path) URIs; None as
    soon as any entry is remote or un-stat-able."""
    from urllib.parse import unquote, urlparse

    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(unquote(p.path))
        except OSError:
            return None
    return total


def _batch_input_bytes(frames: DataFrame) -> int | None:
    """Total on-disk size of a BATCH DataFrame's source files, or None
    when the frame has no enumerable local files. Streaming micro-batch
    frames report NO input files (the plan is a streaming-relation
    wrapper) — those go through ``_source_log_bytes`` instead.

    Assumption: the frame covers its input files EXACTLY. A caller that
    passes a filtered subset of a scan still reports the whole scan's
    bytes here, which inflates the self-tuned bytes/row ratio in
    ``merge_wire_batch`` and makes later batches widen later than
    intended (perf drift only — results are unaffected). Wire feeds
    pass whole micro-batches, which satisfy the assumption."""
    try:
        files = frames.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    return _stat_uris(files)


def _source_log_bytes(checkpoint_path: str | None, batch_id: int | None) -> int | None:
    """Micro-batch size from the file source's checkpoint metadata log —
    the driver-side record of exactly which files this batch reads,
    available BEFORE the batch materializes. Sums across EVERY
    ``<ckpt>/sources/*`` directory (multi-source queries keep one log
    per source), and for each source reads ``<batch_id>`` or — on
    compaction-interval batches, which the file source writes as
    ``<batch_id>.compact`` holding ALL entries since stream start — the
    compact file filtered to entries whose ``batchId`` equals this
    batch. None for non-file sources, a missing log, or
    remote/un-stat-able paths."""
    import json

    if not checkpoint_path or batch_id is None:
        return None
    sources_dir = os.path.join(checkpoint_path, "sources")
    try:
        source_ids = sorted(os.listdir(sources_dir))
    except OSError:
        return None
    total = 0
    saw_any = False
    for sid in source_ids:
        files = []
        for name, is_compact in ((str(batch_id), False), (f"{batch_id}.compact", True)):
            p = os.path.join(sources_dir, sid, name)
            try:
                with open(p) as fh:
                    lines = fh.read().splitlines()
            except OSError:
                continue
            ok = True
            for ln in lines[1:]:  # line 0 is the log-format version marker
                try:
                    entry = json.loads(ln)
                    if is_compact and int(entry.get("batchId", -1)) != batch_id:
                        continue  # compact files replay the whole history
                    files.append(entry["path"])
                except (ValueError, KeyError, TypeError):
                    ok = False
                    break
            if ok:
                break  # parsed this source's log; don't also read the twin
            files = []
        if not files:
            continue  # source contributed no files this batch (or no log)
        sz = _stat_uris(files)
        if sz is None:
            return None
        total += sz
        saw_any = True
    return total if saw_any else None


class StreamingApplyChanges:
    """Continuous apply-changes into a bucket-partitioned parquet state.

    Parameters mirror the batch operator: events carry
    ``CDC_EVENT_SCHEMA`` plus an extracted ``key`` column.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_col: str = "key",
        n_buckets: int = 64,
        retention: int = 2,
        fold_plan: str = "auto",
        merge_plan: str = "replay",
    ) -> None:
        self.spark = spark
        self.state_path = state_path
        self.key_col = key_col
        self.n_buckets = n_buckets
        # Physical fold strategy for the per-batch merge. The streaming
        # merge is the case the single-shuffle array plan was built for:
        # prior state contributes exactly ONE event per key and a batch
        # a bounded burst, so per-key arrays stay small and the plan is
        # ~2x the argmax plan's throughput (profile_apply_ceiling.py).
        # "auto" (the default) reads the probe's per-bucket histogram
        # and falls back to the skew-safe argmax plan for a batch whose
        # largest bucket is both over auto_skew_ratio x the mean and
        # over auto_skew_min_rows absolute — the bucket histogram is a
        # free proxy for a hot key, since a hot key's events all hash
        # to one bucket. Pass "array_fold"/"argmax" to pin the plan.
        self.fold_plan = fold_plan
        self.auto_skew_ratio = 4.0
        self.auto_skew_min_rows = 100_000
        # How prior state combines with a batch. "replay" (the default)
        # re-encodes prior state as events and folds batch ∪ state in
        # ONE single-shuffle array fold. "state_merge" folds only the
        # batch and full-outer-joins the two folded states
        # (cdc/apply.merge_state_with_batch; value-identical — merge ==
        # replay pinned by hypothesis in tests/test_apply_property.py;
        # late keys auto-fall back to replay). MEASURED (r8,
        # BENCH_APPLY_PROFILE_r8.json): state_merge LOSES at both
        # steady-state shapes on local[32] — fold 2.23→3.11 s at
        # 125k-batch/200k-state and 1.79→2.93 s at 20k-batch — because
        # the r7 array fold already made re-folding singleton state
        # events cheap, while the merge pays a batch-fold checkpoint
        # job plus two join executions (fast filter + slow-key
        # detection) over the same state rows. Kept as an explicit
        # plan: it is the shape that wins once state lives in a
        # BUCKETED table whose join needs no prior-side shuffle — the
        # named next lever in SCALE.md. TRUNCATE batches always take
        # the replay plan (expansion needs the key set).
        self.merge_plan = merge_plan
        #: plan the most recent merge actually used (observability)
        self.last_fold_plan: str | None = None
        #: state-combination plan the most recent merge actually used
        self.last_merge_plan: str | None = None
        # versions of history read_at() can time-travel to (storage
        # cost: superseded bucket files for that many commits)
        self.retention = retention
        self.store = BucketedStateStore(spark, state_path)
        #: rolling capture→applied latency samples (see
        #: ``record_latency`` / ``latency_report``) — populated by the
        #: wire path where frames carry capture timestamps
        self._latency: list[dict] = []

    # -- end-to-end latency ----------------------------------------------

    def record_latency(
        self, batch_id: int | None, max_capture_ts, n_rows: int
    ) -> None:
        """Record one micro-batch's capture→applied lag: the wall-clock
        gap between the NEWEST frame's capture timestamp and the moment
        the merged state became durable. Kept as a bounded rolling
        window (driver memory: O(32))."""
        import datetime as _dt
        import time as _time

        if max_capture_ts is None:
            return
        if isinstance(max_capture_ts, _dt.datetime):
            ts = max_capture_ts.timestamp()
        else:
            ts = float(max_capture_ts)
        self._latency.append(
            {
                "batch_id": batch_id,
                "n_rows": int(n_rows),
                "applied_at": round(_time.time(), 3),
                "max_capture_ts": round(ts, 3),
                "capture_to_apply_sec": round(_time.time() - ts, 3),
            }
        )
        del self._latency[:-32]

    def latency_report(self) -> dict:
        """Summary for ``/metrics`` (R16 analog: WAL lag expressed as
        seconds-behind-capture instead of retained bytes).

        Besides the lag quantiles, serves the two numbers an operator
        needs to judge SATURATION live: ``applied_eps_window`` (events
        applied per second over the rolling window — the sustained
        throughput actually achieved) and ``lag_trend_sec_per_batch``
        (first-to-last lag slope across the window; near zero when the
        apply keeps up, persistently positive when the ingest rate
        exceeds the max sustainable rate and the backlog compounds).
        ``saturated`` flags a compounding trend — above 0.2 s of new
        backlog per batch across a full window, i.e. each batch falls
        measurably further behind; small positive slopes are ambient
        jitter, as the sweep's first calibration run showed (a +0.15
        slope at a rate whose p50 was LOWER than the slower phase's).
        The knee is measured by ``tools/bench_latency.py --sweep``."""
        if not self._latency:
            return {"batches_measured": 0}
        lags = sorted(s["capture_to_apply_sec"] for s in self._latency)
        seq = [s["capture_to_apply_sec"] for s in self._latency]
        span = self._latency[-1]["applied_at"] - self._latency[0]["applied_at"]
        events = sum(s["n_rows"] for s in self._latency)
        trend = (seq[-1] - seq[0]) / max(1, len(seq) - 1)
        return {
            "batches_measured": len(self._latency),
            "last": self._latency[-1],
            "capture_to_apply_sec_p50": lags[len(lags) // 2],
            "capture_to_apply_sec_p95": lags[min(len(lags) - 1, int(len(lags) * 0.95))],
            "capture_to_apply_sec_max": lags[-1],
            "applied_eps_window": round(events / span, 1) if span > 0 else None,
            "lag_trend_sec_per_batch": round(trend, 4),
            "saturated": len(seq) >= 8 and trend > 0.2,
        }

    # -- state table ------------------------------------------------------

    def _bucket(self, key: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(key.cast("string")), F.lit(self.n_buckets))

    def current_state(self) -> DataFrame:
        """The materialized table (key, values map, last_lsn) — live rows
        only; tombstones are internal. A multi-table state (feed carried
        ``schema``/``table``) keeps those identity columns."""
        raw = self._raw_state()
        aux = [c for c in _AUX_COLS if c in raw.columns]
        return raw.filter(F.col("values").isNotNull()).select(
            *aux, self.key_col, "values", "last_lsn"
        )

    def _raw_state(self) -> DataFrame:
        state = self.store.read()
        if state is not None:
            return state.drop("bucket")
        return self.spark.createDataFrame(
            [],
            f"{self.key_col} string, values map<string,string>, "
            "last_lsn bigint, del_lsn bigint",
        )

    def _state_as_events(self, state: DataFrame) -> DataFrame:
        """Re-encode state rows as events so the batch fold's sentinel /
        delete-boundary semantics compose across batches: a live row
        becomes INSERT@last_lsn, a tombstone becomes DELETE@del_lsn (both
        for keys that were deleted then re-inserted). Table-identity
        columns (multi-table state) ride along so a later batch's
        TRUNCATE expands against the right table's keys."""
        return state_as_events(state, self.key_col)

    # -- initial snapshot --------------------------------------------------

    def bootstrap(
        self,
        snapshot: DataFrame,
        snapshot_lsn: int,
        schema: str | None = None,
        table: str | None = None,
    ) -> None:
        """Initial-snapshot load: seed the state table from an existing
        source table BEFORE attaching the change stream — the
        snapshot-then-stream pattern (the reference has no equivalent;
        its consumers start from WAL only, so a pre-existing table never
        reaches the sink). Every snapshot row becomes a live state row
        at ``snapshot_lsn``; when the stream attaches, events with
        ``lsn > snapshot_lsn`` win the per-key fold and events at or
        below it (late WAL from before the snapshot point) lose to the
        snapshot image — the max-lsn fold gives exactly the right
        overlap semantics with no filtering step.

        ``snapshot`` carries ``key_col`` plus the row columns; all
        columns (key included, matching the decode path's new_values)
        are string-cast into the values map. Call once on an empty
        state; committing over all buckets makes the bootstrap itself
        crash-atomic (same manifest swap as every other commit).

        For a stream whose events carry ``schema``/``table`` (decoded
        wire frames), pass both here so the seeded state is in the same
        multi-table mode — call once per snapshotted table (repeat
        calls are allowed only in multi-table mode, for tables not yet
        seeded)."""
        if (schema is None) != (table is None):
            raise ValueError("pass schema and table together (or neither)")
        existing = self.store.read()
        if existing is not None:
            if schema is None or "table" not in existing.columns:
                raise ValueError("bootstrap requires an empty state store")
            already = existing.filter(
                (F.col("schema") == schema) & (F.col("table") == table)
            ).head(1)
            if already:
                raise ValueError(
                    f"state already holds rows for {schema}.{table}"
                )
        aux_cols = (
            [F.lit(schema).alias("schema"), F.lit(table).alias("table")]
            if schema is not None
            else []
        )
        values = F.map_from_arrays(
            F.array(*[F.lit(c) for c in snapshot.columns]),
            F.array(*[F.col(c).cast("string") for c in snapshot.columns]),
        )
        state = (
            snapshot.select(
                *aux_cols,
                F.col(self.key_col).cast("string").alias(self.key_col),
                values.alias("values"),
                F.lit(snapshot_lsn).cast("long").alias("last_lsn"),
                F.lit(None).cast("long").alias("del_lsn"),
            )
            .withColumn("bucket", self._bucket(F.col(self.key_col)))
            .repartition(max(1, self.n_buckets // 4), "bucket")
        )
        if existing is not None:
            # repeat multi-table seed: commit() replaces every touched
            # bucket wholesale, so prior tables' rows must ride along
            state = existing.select(state.columns).unionByName(state)
        self.store.commit(state, list(range(self.n_buckets)))

    # -- merge ------------------------------------------------------------

    def merge_batch(self, batch: DataFrame, batch_id: int | None = None) -> list[int]:
        """Merge one (micro-)batch of events into the state table.
        Returns the bucket ids the batch touched (for derived-state
        maintainers layered on top, e.g. StreamingIncrementalAgg).

        ``schema``/``table`` columns, when the feed carries both, are
        kept through the merge and persisted in the state ("multi-table
        mode"): the fold keys on (schema, table, key) and TRUNCATE
        expansion stays scoped to the truncated table. A feed must be
        consistent about the mode — mixing a multi-table feed into
        single-table state (or vice versa) raises, because the two key
        spaces cannot be reconciled after the fact.

        A batch containing a TRUNCATE widens the merge to EVERY live
        bucket: the truncate event is keyless (it hashes to one
        arbitrary bucket), but it must tombstone matching keys in all
        buckets — restricting the merge to the batch's own buckets
        would silently leave truncated rows alive elsewhere. Cost is
        O(total state) for that batch, which is also the semantic
        floor: a truncate genuinely touches every key of its table.
        (A per-table bucket index would prune this to the table's own
        buckets; at one-table-per-stream granularity it is the same
        set.)"""
        aux = [c for c in _AUX_COLS if c in batch.columns]
        if len(aux) != len(_AUX_COLS):
            aux = []  # need BOTH columns for per-table semantics
        batch = batch.select(
            "lsn", "operation", "new_values", *aux, F.col(self.key_col)
        ).withColumn("bucket", self._bucket(F.col(self.key_col)))

        # one probe job answers both questions (bucket set + truncate
        # presence) — two separate actions would each re-execute the
        # batch's upstream lineage (decode, key extraction)
        probe = (
            batch.groupBy("bucket")
            .agg(
                F.max(
                    F.when(F.col("operation") == "TRUNCATE", 1).otherwise(0)
                ).alias("__t"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        has_truncate = any(r["__t"] for r in probe)
        batch_buckets = [r["bucket"] for r in probe]
        if not batch_buckets:
            return []
        if self.fold_plan == "auto":
            counts = [r["__n"] for r in probe]
            mx = max(counts)
            # compare the hottest bucket against the MEAN OF THE OTHERS
            # (max-vs-overall-mean is bounded by the occupied-bucket
            # count, so it can never fire when a burst lands in one of
            # two buckets); a store configured with one bucket should
            # pin the plan explicitly
            others = (sum(counts) - mx) / max(1, len(counts) - 1)
            skewed = (
                mx > self.auto_skew_ratio * max(others, 1.0)
                and mx > self.auto_skew_min_rows
            )
            plan = "argmax" if skewed else "array_fold"
        else:
            plan = self.fold_plan
        self.last_fold_plan = plan
        live_buckets = [int(b) for b in self.store._load_manifest()["buckets"]]
        if has_truncate:
            touched = sorted(set(live_buckets) | set(batch_buckets))
            prior = self.store.read()
        else:
            touched = batch_buckets
            prior = self.store.read(touched)

        mode_probe = prior
        if mode_probe is None and live_buckets:
            # live state outside the touched buckets still fixes the mode
            mode_probe = self.store.read(live_buckets[:1])
        if mode_probe is not None:
            state_aux = [c for c in _AUX_COLS if c in mode_probe.columns]
            if bool(aux) != bool(state_aux):
                raise ValueError(
                    "feed/state table-identity mismatch: the batch "
                    f"{'carries' if aux else 'lacks'} schema/table columns "
                    f"but the existing state {'lacks' if aux else 'carries'} "
                    "them — a stream must be consistently single-table or "
                    "multi-table (bootstrap with schema/table for a "
                    "multi-table stream)"
                )

        events = batch.drop("bucket")
        fold = (
            apply_changes_with_tombstones_multi
            if aux
            else apply_changes_with_tombstones
        )
        if (
            self.merge_plan == "state_merge"
            and prior is not None
            and not has_truncate
        ):
            # fold the batch alone, join-merge with prior folded state;
            # late keys fall back to replay inside the operator
            self.last_merge_plan = "state_merge"
            new_state = merge_state_with_batch(
                prior.drop("bucket"), events, self.key_col, plan=plan
            )
        else:
            # replay plan: prior state re-encoded as events rides
            # through the same fold as the batch. Tombstoned fold:
            # every previously-present key yields a row, so a touched
            # bucket can never silently vanish from the commit.
            self.last_merge_plan = "replay"
            if prior is not None:
                events = events.unionByName(
                    self._state_as_events(prior.drop("bucket"))
                )
            new_state = fold(
                events, self.key_col,
                plan=plan, has_truncates=has_truncate,
            )
        new_state = new_state.withColumn(
            "bucket", self._bucket(F.col(self.key_col))
        ).repartition(max(1, len(touched)), "bucket")
        # The store writes a NEW immutable version dir while the fold's
        # lineage reads the old one (no self-overwrite hazard), then the
        # manifest swap commits atomically; vacuum reclaims superseded
        # and orphaned versions.
        self.store.commit(new_state, touched)
        self.store.vacuum(retain_last=self.retention)
        return touched

    # -- streaming driver -------------------------------------------------

    def start(
        self,
        events: DataFrame,
        checkpoint_path: str,
        available_now: bool = False,
    ) -> StreamingQuery:
        """Attach to a streaming event feed and run continuously.

        ``checkpoint_path`` is the offset/commit log — the engine-side
        replacement for the reference's replication slot
        (``postgre_cdc_consumer.py:47-58``): deleting it == dropping the
        slot (reprocess from scratch)."""
        writer = (
            events.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_path)
            .foreachBatch(lambda df, bid: self.merge_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class StreamingWireApplyChanges(StreamingApplyChanges):
    """Apply-changes directly from RAW pgoutput wire frames, with live
    schema evolution.

    ``StreamingApplyChanges`` consumes pre-decoded events, which forces
    the relation registry to be fixed before the stream starts. Here the
    registry refreshes INSIDE every micro-batch: R-frames that arrive
    mid-stream (Postgres re-sends a Relation message after DDL) update
    the relid → schema mapping before that batch's data frames decode —
    the distributed analog of the reference's registry overwrite on each
    ``R`` message (``pg_output_parser.py:88-93``).

    The merged registry is persisted (atomic tmp+rename) next to the
    state table so a restart resumes with the schemas learned so far;
    replaying R-frames after a crash is idempotent (later LSN wins).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_extractor,
        key_col: str = "key",
        n_buckets: int = 64,
        initial_registry: dict[int, dict] | None = None,
        origin: str = "any",
    ) -> None:
        super().__init__(spark, state_path, key_col, n_buckets)
        self.key_extractor = key_extractor
        self.registry: dict[int, dict] = dict(initial_registry or {})
        self._registry_path = state_path.rstrip("/") + "_registry.json"
        # Subscription origin parameter ("any" | "none" | iterable of
        # allowed origin names): with anything but "any", each batch's
        # events are resolved against B/O txn markers and filtered
        # BEFORE the fold — the loop-breaking subscriber semantics of
        # bidirectional replication (cdc/origins.py). The carry (last
        # marker of the previous batch) persists next to the registry so
        # a transaction spanning micro-batches — or a restart — keeps
        # its origin.
        self.origin = origin
        self._origin_path = state_path.rstrip("/") + "_origin.json"
        # before/after are pinned per batch_id so a crash-replayed batch
        # re-seeds with the carry it saw the FIRST time, not its own
        # post-batch marker (the rollup stream's state-version-pin
        # pattern applied to the origin carry).
        self._origin_state: dict = {
            "batch_id": None, "before": None, "after": None
        }
        self._load_registry()

    def _load_registry(self) -> None:
        import json

        if os.path.isfile(self._registry_path):
            with open(self._registry_path) as fh:
                persisted = {int(k): v for k, v in json.load(fh).items()}
            # learned schemas win over the constructor's initial seed
            self.registry = {**self.registry, **persisted}
        if os.path.isfile(self._origin_path):
            with open(self._origin_path) as fh:
                self._origin_state = json.load(fh)

    def _save_origin_state(self) -> None:
        import json

        tmp = self._origin_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._origin_state, fh)
        os.replace(tmp, self._origin_path)

    def _save_registry(self) -> None:
        import json

        tmp = self._registry_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.registry, fh)
        os.replace(tmp, self._registry_path)

    def merge_wire_batch(self, frames: DataFrame, batch_id: int | None = None) -> None:
        """One micro-batch of raw frames: registry refresh → decode → merge.

        Wire-profile shape (r11 verdict #3): a file-source micro-batch
        arrives with as many partitions as it has FILES (often a
        handful), which runs the Python frame decode nearly serially on
        a wide executor — at 10M events that serialization, not the
        decode loop itself, was the 0.72/decade exponent. The batch is
        materialized ONCE (so the R-frame/stats aggregate, the decode,
        and the merge all read memory, not three separate file scans),
        and a wide batch is repartitioned to the session's parallelism
        so the decode runs executor-wide; small batches skip the
        shuffle (its fixed cost would dominate a latency-sized batch).

        Wide is decided by SOURCE FILE BYTES (>= _WIDE_DECODE_BYTES) —
        known on the driver BEFORE materialization, so a huge batch is
        widened first and checkpointed once, never held in memory at
        file-count width just to count rows. The size comes from the
        batch frame's own input files (batch-mode calls) or the file
        source's checkpoint metadata log (streaming micro-batches
        report no input files). Sourceless batches fall back to the
        row gate (>= _WIDE_DECODE_ROWS), which costs a second
        checkpoint only on the rare wide in-memory batch.

        The byte threshold SELF-TUNES: _WIDE_DECODE_BYTES only seeds
        the first decision (calibrated to ~14 B/row parquet frames);
        once a batch has been counted, the observed bytes/row ratio
        re-expresses the ROW gate in bytes, so a feed with fat frames
        (large text payloads) widens at the same row count as a lean
        one instead of at 14× fewer rows."""
        from python_cdc_spark.cdc.pgoutput import (
            _LSN_MIN,
            _parse_relation_frame,
            decode_frames,
        )

        in_bytes = _batch_input_bytes(frames)
        if in_bytes is None:
            in_bytes = _source_log_bytes(getattr(self, "_wire_ckpt", None), batch_id)
        par = max(int(self.spark.sparkContext.defaultParallelism), 1)
        bpr = getattr(self, "_bytes_per_row", None)
        wide_bytes = _WIDE_DECODE_BYTES if bpr is None else bpr * _WIDE_DECODE_ROWS
        if in_bytes is not None and in_bytes >= wide_bytes:
            frames = frames.repartition(par)
        frames = frames.localCheckpoint(eager=True)
        one = frames.agg(
            F.max("ts").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            # O(DDL events) in the batch — metadata-scale collect
            F.collect_list(
                F.when(
                    F.substring("frame", 1, 1) == "R",
                    F.struct("lsn", "frame"),
                )
            ).alias("rels"),
        ).first()
        if in_bytes is not None and int(one["n"] or 0) > 0:
            self._bytes_per_row = in_bytes / int(one["n"])
        rel_rows = one["rels"] or []
        if in_bytes is None and int(one["n"] or 0) >= _WIDE_DECODE_ROWS:
            frames = frames.repartition(par).localCheckpoint(eager=True)
        # The batch decodes with an LSN-VERSIONED registry: the carried
        # registry (previous batches / snapshot seed) is valid from the
        # start of the LSN axis, and each R frame in THIS batch opens a
        # new version at its own LSN — so a DDL mid-batch (e.g. a column
        # rename between two inserts of the same micro-batch) decodes
        # each side with the schema in force at its LSN instead of
        # letting the batch's last R frame rewrite history.
        versions: dict[int, list] = {
            relid: [(_LSN_MIN, rel)] for relid, rel in self.registry.items()
        }
        if rel_rows:
            for row in sorted(rel_rows, key=lambda r: r["lsn"]):
                relid, rel = _parse_relation_frame(bytes(row["frame"]))
                versions.setdefault(relid, []).append((int(row["lsn"]), rel))
                self.registry[relid] = rel  # latest-wins carry for the NEXT batch
            self._save_registry()

        events = decode_frames(self.spark, frames, registry=versions)
        if self.origin != "any":
            from python_cdc_spark.cdc.origins import (
                annotate_origins,
                filter_by_origin,
                last_marker,
            )

            st = self._origin_state
            seed = (
                st["before"]
                if batch_id is not None and st["batch_id"] == batch_id
                else st["after"]
            )
            marker = last_marker(frames)
            events = filter_by_origin(
                annotate_origins(
                    self.spark, events, frames, initial_origin=seed
                ),
                self.origin,
            ).drop("origin")
            self._origin_state = {
                "batch_id": batch_id,
                "before": seed,
                "after": marker["origin"] if marker is not None else seed,
            }
            self._save_origin_state()
        self.merge_batch(self.key_extractor(events), batch_id)
        # state is durable now — the capture→applied gap is the e2e lag
        self.record_latency(batch_id, one["mx"], one["n"])

    def start_wire(
        self,
        frames: DataFrame,
        checkpoint_path: str,
        available_now: bool = False,
    ) -> StreamingQuery:
        """Attach to a streaming RAW-frame feed (lsn, ts, frame binary)."""
        self._wire_ckpt = checkpoint_path  # for the per-batch bytes signal
        writer = (
            frames.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_path)
            .foreachBatch(lambda df, bid: self.merge_wire_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def drop_checkpoint(checkpoint_path: str) -> None:
    """The ``drop_replication_slot`` analog (R2): forget offsets so the
    next start reprocesses the feed from the beginning."""
    import shutil

    if os.path.isdir(checkpoint_path):
        shutil.rmtree(checkpoint_path)


class StreamingApplyChangesTable:
    """The r9 lever, wired end-to-end: streaming apply over a BUCKETED
    TABLE state (``BucketedTableStateStore``) merged with
    ``cdc/apply.merge_state_with_batch`` — the join plan that loses on
    plain parquet state (BENCH_APPLY_PROFILE_r8.json) precisely because
    the prior side must shuffle; a bucketed prior removes that exchange
    (tools/bench_bucketed_join.py: 2 → 1 exchanges, ~2.2× on the join).

    Deliberately minimal next to :class:`StreamingApplyChanges`: no
    per-bucket pruning (a bucketed table rewrites the WHOLE state per
    commit, so this backend fits full-touch merge shapes — the
    saturation profile — while the directory store keeps the
    O(touched) contract for localized batches), same fold semantics
    (TRUNCATE batches and the cold start take the replay fold; steady
    batches take the state-merge join with its late-event fallback).
    Value-equality with the batch fold is pinned by
    ``test_streaming_table_backend_matches_batch``.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_col: str = "key",
        n_buckets: int = 64,
        table_name: str | None = None,
        retention: int = 1,
        fold_plan: str = "array_fold",
    ) -> None:
        from python_cdc_spark.streaming.state_store import (
            BucketedTableStateStore,
        )

        self.spark = spark
        self.key_col = key_col
        self.fold_plan = fold_plan
        self.retention = retention
        name = table_name or (
            "state_" + hashlib.md5(state_path.encode()).hexdigest()[:12]
        )
        self.store = BucketedTableStateStore(
            spark, state_path, name, key_col=key_col, n_buckets=n_buckets
        )
        self.last_merge_plan: str | None = None

    def merge_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        aux = [c for c in _AUX_COLS if c in batch.columns]
        if len(aux) != len(_AUX_COLS):
            aux = []
        events = batch.select(
            "lsn", "operation", "new_values", *aux, F.col(self.key_col)
        )
        has_truncate = bool(
            events.filter(F.col("operation") == "TRUNCATE").head(1)
        )
        prior = self.store.read()
        fold = (
            apply_changes_with_tombstones_multi
            if aux
            else apply_changes_with_tombstones
        )
        if prior is not None and not has_truncate:
            self.last_merge_plan = "state_merge"
            new_state = merge_state_with_batch(
                prior, events, self.key_col, plan=self.fold_plan
            )
        else:
            self.last_merge_plan = "replay"
            if prior is not None:
                events = events.unionByName(
                    state_as_events(prior, self.key_col)
                )
            new_state = fold(
                events, self.key_col,
                plan=self.fold_plan, has_truncates=has_truncate,
            )
        self.store.commit(new_state)
        self.store.vacuum(retain_last=self.retention)

    def current_state(self) -> DataFrame:
        state = self.store.read()
        if state is None:
            raise ValueError("no state committed yet")
        return state.filter(F.col("values").isNotNull()).drop("del_lsn")
