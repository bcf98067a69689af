"""BucketedStateStore: crash-atomic manifest commits over immutable
version dirs (the fix for round-1's non-atomic dynamic overwrite)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from python_cdc_spark.streaming.state_store import BucketedStateStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, val long, bucket int")


@pytest.fixture()
def store(spark, tmp_path):
    return BucketedStateStore(spark, str(tmp_path / "state"))


def test_roundtrip_and_bucket_pruned_read(spark, store):
    store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1)]), touched=[0, 1])
    got = {(r["key"], r["val"], r["bucket"]) for r in store.read().collect()}
    assert got == {("a", 1, 0), ("b", 2, 1)}
    only0 = store.read([0]).collect()
    assert [(r["key"], r["bucket"]) for r in only0] == [("a", 0)]


def test_untouched_buckets_survive_later_commits(spark, store):
    store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1)]), touched=[0, 1])
    store.commit(_df(spark, [("b", 20, 1)]), touched=[1])
    got = {(r["key"], r["val"]) for r in store.read().collect()}
    assert got == {("a", 1), ("b", 20)}
    manifest = json.load(open(os.path.join(store.path, "_manifest.json")))
    assert manifest["buckets"] == {"0": 1, "1": 2}


def test_crash_before_manifest_swap_preserves_old_state(spark, store):
    store.commit(_df(spark, [("a", 1, 0)]), touched=[0])
    # simulate a crash mid-commit: the new version's files land on disk
    # but the process dies before the manifest rename
    doomed = _df(spark, [("a", 99, 0)])
    doomed.withColumn("b", doomed["bucket"]).write.partitionBy("b").parquet(
        os.path.join(store.path, "v2")
    )
    got = [(r["key"], r["val"]) for r in store.read().collect()]
    assert got == [("a", 1)]  # old manifest, old state — fully consistent
    # recovery: the orphan is unreferenced garbage, vacuum reclaims it
    removed = store.vacuum()
    assert removed == [os.path.join(store.path, "v2")]
    assert [(r["key"], r["val"]) for r in store.read().collect()] == [("a", 1)]


def test_emptied_bucket_leaves_manifest(spark, store):
    store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1)]), touched=[0, 1])
    # bucket 0 folds to zero rows (e.g. every key fully expired)
    store.commit(_df(spark, [("b", 3, 1)]), touched=[0, 1])
    got = {(r["key"], r["val"]) for r in store.read().collect()}
    assert got == {("b", 3)}
    manifest = json.load(open(os.path.join(store.path, "_manifest.json")))
    assert "0" not in manifest["buckets"]


def test_vacuum_reclaims_superseded_versions(spark, store):
    store.commit(_df(spark, [("a", 1, 0)]), touched=[0])
    store.commit(_df(spark, [("a", 2, 0)]), touched=[0])
    removed = store.vacuum()
    assert removed == [os.path.join(store.path, "v1")]
    assert [(r["key"], r["val"]) for r in store.read().collect()] == [("a", 2)]


def test_empty_store_reads_none(store):
    assert store.read() is None
    assert store.read([0, 5]) is None
    assert store.vacuum() == []


def test_read_filters_are_path_pruned(spark, store):
    """A touched-bucket read lists only the touched buckets' dirs — the
    scan never opens untouched buckets' files."""
    store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1), ("c", 3, 2)]), [0, 1, 2])
    df = store.read([1])
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files and all("/b=1/" in f for f in files)


def test_crash_replay_commits_over_orphan(spark, store):
    """ADVICE r2 (updated r13): a crash after the v<N> write but before
    the manifest swap used to wedge the stream — the replayed
    micro-batch recomputed the same new_version and errorifexists
    threw. Under the stage-and-claim protocol the replay CLAIMS THE
    NEXT free slot instead of deleting the orphan (which could be a
    racing writer's committed dir); the orphan stays unreferenced for
    vacuum."""
    store.commit(_df(spark, [("a", 1, 0)]), touched=[0])
    doomed = _df(spark, [("a", 99, 0)])
    doomed.withColumn("b", doomed["bucket"]).write.partitionBy("b").parquet(
        os.path.join(store.path, "v2")
    )  # crash happened here: v2 on disk, manifest still at v1
    # the replayed batch (possibly with different data) must succeed
    v = store.commit(_df(spark, [("a", 2, 0)]), touched=[0])
    assert v == 3  # claimed past the orphan, never reused/deleted it
    assert [(r["key"], r["val"]) for r in store.read().collect()] == [("a", 2)]
    removed = store.vacuum()
    assert any(r.endswith("v2") for r in removed)


def test_snapshot_written_after_commit_point(spark, store):
    """ADVICE r2: the per-version snapshot must not exist for a version
    the main manifest never committed — read_at may never serve
    uncommitted state."""
    store.commit(_df(spark, [("a", 1, 0)]), touched=[0])
    # simulate pre-fix debris: a snapshot for a version beyond the
    # committed manifest (crash between snapshot and swap, old layout)
    snap = os.path.join(store.path, "_manifest_v9.json")
    json.dump({"version": 9, "buckets": {"0": 9}}, open(snap, "w"))
    with pytest.raises(FileNotFoundError):
        store.read_at(9)


def test_vacuum_prunes_old_snapshots(spark, store):
    for i in range(4):
        store.commit(_df(spark, [("a", i, 0)]), touched=[0])
    snaps = lambda: sorted(
        f for f in os.listdir(store.path) if f.startswith("_manifest_v")
    )
    assert len(snaps()) == 4
    # retain_last=2 keeps 2 SUPERSEDED snapshots below the always-live
    # current (the unified maintenance semantics, aligned r13)
    store.vacuum(retain_last=2)
    assert snaps() == ["_manifest_v2.json", "_manifest_v3.json", "_manifest_v4.json"]
    store.vacuum()
    assert snaps() == ["_manifest_v4.json"]


def test_time_travel_read_at(spark, tmp_path):
    """read_at(v) must reproduce the state as of commit v while the
    retention window keeps its files; vacuum(retain_last) preserves
    exactly that window."""
    import pytest

    from python_cdc_spark.streaming.state_store import BucketedStateStore

    store = BucketedStateStore(spark, str(tmp_path / "st"))
    df1 = spark.createDataFrame([(0, "a", 1)], ["bucket", "k", "x"])
    v1 = store.commit(df1, [0])
    df2 = spark.createDataFrame([(0, "a", 2), (1, "b", 9)], ["bucket", "k", "x"])
    v2 = store.commit(df2, [0, 1])
    store.vacuum(retain_last=2)

    at1 = {(r["k"], r["x"]) for r in store.read_at(v1).collect()}
    at2 = {(r["k"], r["x"]) for r in store.read_at(v2).collect()}
    assert at1 == {("a", 1)}
    assert at2 == {("a", 2), ("b", 9)}

    with pytest.raises(FileNotFoundError):
        store.read_at(99)

    # zero-retention vacuum reclaims v1's superseded bucket data
    store.vacuum()
    cur = {(r["k"], r["x"]) for r in store.read().collect()}
    assert cur == at2


def test_bucketed_table_store_roundtrip_and_shuffle_free_join(spark, tmp_path):
    """The r9-lever storage brick: commits are crash-atomic versioned
    bucketed TABLES, reads report join-compatible partitioning (the
    merge join plans ONE hash exchange — the batch side — instead of
    two), replay of a crashed commit overwrites its orphan, and vacuum
    drops superseded versions."""
    from pyspark.sql import functions as F

    from python_cdc_spark.streaming.state_store import BucketedTableStateStore

    store = BucketedTableStateStore(
        spark, str(tmp_path / "ptr"), "t_state_test", key_col="key", n_buckets=4
    )
    assert store.read() is None

    state1 = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.map_from_arrays(F.array(F.lit("v")), F.array(F.col("id").cast("string"))).alias("values"),
        F.col("id").alias("last_lsn"),
        F.lit(None).cast("long").alias("del_lsn"),
    )
    assert store.commit(state1) == 1
    got = store.read()
    assert got.count() == 100

    # join-compatibility: with broadcast disabled, the bucketed prior
    # contributes NO exchange — only the probe side shuffles
    probe = spark.range(50, 150).select(F.col("id").cast("string").alias("key"))
    with_conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = got.join(probe, "key", "full_outer")
        n_exch = j._jdf.queryExecution().toString().count("Exchange hashpartitioning")
        assert n_exch == 1, f"bucketed prior must not shuffle (got {n_exch})"
        plain = spark.read.parquet(
            spark.sql(f"DESCRIBE EXTENDED {store._table(1)}")
            .filter("col_name = 'Location'").first()["data_type"].replace("file:", "")
        )
        n_plain = (
            plain.join(probe, "key", "full_outer")
            ._jdf.queryExecution().toString().count("Exchange hashpartitioning")
        )
        assert n_plain == 2  # the same files WITHOUT bucket metadata shuffle twice
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_conf)

    # crash replay: pre-create the orphan table v2 (crash past the
    # write, before the swap), then commit again — must overwrite
    state2 = state1.withColumn("last_lsn", F.col("last_lsn") + 1000)
    spark.sql("DROP TABLE IF EXISTS t_state_test_v2")
    state1.limit(3).write.bucketBy(4, "key").sortBy("key").format(
        "parquet"
    ).saveAsTable("t_state_test_v2")
    assert store.version == 1  # the orphan is not visible
    assert store.commit(state2) == 2
    assert store.read().agg(F.max("last_lsn")).first()[0] == 1099

    # RESTART-orphan: a fresh session's in-memory catalog forgets the
    # table but its managed LOCATION survives and would block the next
    # write (LOCATION_ALREADY_EXISTS) — simulate by dropping v3 from
    # the catalog while recreating its directory on disk
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    orphan = os.path.join(wh, "t_state_test_v3")
    spark.sql("DROP TABLE IF EXISTS t_state_test_v3")
    os.makedirs(orphan, exist_ok=True)
    open(os.path.join(orphan, "part-junk.parquet"), "w").close()
    assert store.commit(state1) == 3  # reclaims the orphan location
    assert store.read().count() == 100

    # vacuum: with retain_last=0 only the current table survives
    dropped = store.vacuum(retain_last=0)
    assert "t_state_test_v1" in dropped and "t_state_test_v2" in dropped
    assert store.read().count() == 100
    for t in ("t_state_test_v1", "t_state_test_v2", "t_state_test_v3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
