"""Optimistic concurrency at the pointer swap (r12 verdict #6):
``fsops.cas_publish`` + stage-and-claim staging make a second writer
racing the publish lose CLEANLY — exactly one winner, the loser
raising ConcurrentWriterError with its staged dirs left unreferenced
(vacuum fodder), and a retry from a fresh read succeeding."""

from __future__ import annotations

import os
import threading

import pytest

from python_cdc_spark import fsops
from python_cdc_spark.maintenance import vacuum


# --- primitive -------------------------------------------------------------


def test_cas_publish_token_protocol(tmp_path):
    p = str(tmp_path / "ptr.json")
    # must-not-exist precondition
    obj, tok = fsops.read_json_with_token(p)
    assert obj is None and tok is None
    fsops.cas_publish(p, {"v": 1}, tok)
    assert fsops.read_json(p) == {"v": 1}
    # stale token (pre-first-publish) loses
    with pytest.raises(fsops.ConcurrentWriterError):
        fsops.cas_publish(p, {"v": 99}, None)
    assert fsops.read_json(p) == {"v": 1}
    # fresh token wins; token changes across a publish even for
    # byte-identical content (new inode via the temp-file rename)
    obj, tok1 = fsops.read_json_with_token(p)
    fsops.cas_publish(p, {"v": 1}, tok1)
    _, tok2 = fsops.read_json_with_token(p)
    assert tok1 != tok2
    with pytest.raises(fsops.ConcurrentWriterError):
        fsops.cas_publish(p, {"v": 2}, tok1)
    fsops.cas_publish(p, {"v": 2}, tok2)
    assert fsops.read_json(p) == {"v": 2}


def test_cas_publish_lock_contention_and_stale_break(tmp_path):
    p = str(tmp_path / "ptr.json")
    fsops.publish_json(p, {"v": 0})
    obj, tok = fsops.read_json_with_token(p)
    # a held (recent) lock refuses immediately
    with open(p + ".lock", "w"):
        pass
    with pytest.raises(fsops.ConcurrentWriterError):
        fsops.cas_publish(p, {"v": 1}, tok)
    # a STALE lock (its owner crashed mid-publish, never renamed) is
    # broken: the committed pointer is intact so the token still decides
    old = os.path.getmtime(p + ".lock") - 3600
    os.utime(p + ".lock", (old, old))
    fsops.cas_publish(p, {"v": 1}, tok, stale_lock_secs=60.0)
    assert fsops.read_json(p) == {"v": 1}
    assert not os.path.exists(p + ".lock")


def test_rename_no_clobber_claims_next_slot(tmp_path):
    a = tmp_path / "stage_a"
    a.mkdir()
    (a / "f").write_text("A")
    b = tmp_path / "stage_b"
    b.mkdir()
    (b / "f").write_text("B")
    dst = str(tmp_path / "v1")
    assert fsops.rename_no_clobber(str(a), dst)
    # occupied (non-empty) slot is refused, not clobbered
    assert not fsops.rename_no_clobber(str(b), dst)
    assert (tmp_path / "v1" / "f").read_text() == "A"
    assert fsops.rename_no_clobber(str(b), str(tmp_path / "v2"))


# --- end-to-end: BM25 two-writer races -------------------------------------

BASE = [
    (1, "join scan filter alpha beta"),
    (2, "merge join gamma"),
    (3, "scan scan scan delta"),
    (4, "filter epsilon"),
]
DELTA_A = [("UPDATE", 2, "filter iota join"), ("INSERT", 9, "join kappa")]
DELTA_B = [("DELETE", 3, None), ("INSERT", 7, "scan lambda join")]
TERMS = ("join", "scan", "filter")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _delta(spark, rows):
    return spark.createDataFrame(rows, "operation string, doc_id long, text string")


def _search(spark, idx):
    from python_cdc_spark.operators.bm25_index import bm25_search

    return sorted(map(tuple, bm25_search(spark, idx, TERMS, 10).collect()))


def test_bm25_fold_loser_detects_and_retries(spark, tmp_path, monkeypatch):
    """Deterministic interleave: writer A reads the pointer, then writer
    B's full fold commits inside A's read-to-publish window. A must lose
    at the CAS (never clobbering B's commit), and A's plain retry must
    land both deltas."""
    import python_cdc_spark.operators.bm25_index as B

    idx = str(tmp_path / "idx")
    B.build_bm25_index(spark, _docs(spark, BASE), idx)

    orig = B._read_ptr_with_token
    fired = {"done": False}

    def hooked(path):
        ptr, tok = orig(path)
        if not fired["done"]:
            fired["done"] = True
            # writer B races in and wins while A holds its token
            B.cdc_bm25_update(spark, path, _delta(spark, DELTA_B))
        return ptr, tok

    monkeypatch.setattr(B, "_read_ptr_with_token", hooked)
    with pytest.raises(fsops.ConcurrentWriterError):
        B.cdc_bm25_update(spark, idx, _delta(spark, DELTA_A))
    # the index IS writer B's commit — A's loss changed nothing
    ref_b = str(tmp_path / "ref_b")
    B.build_bm25_index(spark, _docs(spark, BASE), ref_b)
    B.cdc_bm25_update(spark, ref_b, _delta(spark, DELTA_B))
    assert _search(spark, idx) == _search(spark, ref_b)

    # loser retries from a fresh read → both deltas applied
    B.cdc_bm25_update(spark, idx, _delta(spark, DELTA_A))
    ref = str(tmp_path / "ref")
    B.build_bm25_index(spark, _docs(spark, BASE), ref)
    B.cdc_bm25_update(spark, ref, _delta(spark, DELTA_B))
    B.cdc_bm25_update(spark, ref, _delta(spark, DELTA_A))
    assert _search(spark, idx) == _search(spark, ref)

    # the losing attempt's claimed-but-unreferenced slots are vacuum
    # fodder; reclaiming them must not move search results
    vacuum(spark, idx)
    assert _search(spark, idx) == _search(spark, ref)


def test_bm25_fold_two_threads_exactly_one_wins(spark, tmp_path, monkeypatch):
    """Genuine concurrency: two threads fold different deltas, a
    barrier guaranteeing both read the pointer before either publishes.
    Exactly one commits; the loser raises ConcurrentWriterError, then
    retries and lands. Disjoint doc-id deltas commute, so the final
    index equals sequential application in either order."""
    import python_cdc_spark.operators.bm25_index as B

    idx = str(tmp_path / "idx")
    B.build_bm25_index(spark, _docs(spark, BASE), idx)

    orig = B._read_ptr_with_token
    barrier = threading.Barrier(2, timeout=120)
    in_race = threading.local()

    def hooked(path):
        ptr, tok = orig(path)
        if getattr(in_race, "on", False):
            in_race.on = False  # only the first read per racer waits
            barrier.wait()
        return ptr, tok

    monkeypatch.setattr(B, "_read_ptr_with_token", hooked)
    outcomes = {}

    def racer(tag, delta_rows):
        in_race.on = True
        try:
            B.cdc_bm25_update(spark, idx, _delta(spark, delta_rows))
            outcomes[tag] = "won"
        except fsops.ConcurrentWriterError:
            outcomes[tag] = "lost"
        except Exception as e:  # pragma: no cover - diagnostic
            outcomes[tag] = f"error: {e}"

    ta = threading.Thread(target=racer, args=("a", DELTA_A))
    tb = threading.Thread(target=racer, args=("b", DELTA_B))
    ta.start(), tb.start()
    ta.join(300), tb.join(300)
    assert sorted(outcomes.values()) == ["lost", "won"], outcomes

    # loser retries cleanly
    loser = next(t for t, r in outcomes.items() if r == "lost")
    B.cdc_bm25_update(
        spark, idx, _delta(spark, DELTA_A if loser == "a" else DELTA_B)
    )
    ref = str(tmp_path / "ref")
    B.build_bm25_index(spark, _docs(spark, BASE), ref)
    B.cdc_bm25_update(spark, ref, _delta(spark, DELTA_B))
    B.cdc_bm25_update(spark, ref, _delta(spark, DELTA_A))
    assert _search(spark, idx) == _search(spark, ref)


# --- end-to-end: rollup refresh race ---------------------------------------


def test_rollup_refresh_race_loses_cleanly(spark, tmp_path, monkeypatch):
    """Same discipline on the rollup catalog: a competing refresh
    commits inside this writer's window → ConcurrentWriterError, the
    committed cube is the winner's, and a retry folds on top of it."""
    from python_cdc_spark.plans.rollup import RollupCatalog

    cat = RollupCatalog(spark, str(tmp_path / "cat"))
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, g string, x double"
    )
    cat.define("cube", src, {"g": "g"}, {"sx": ("sum", "x")}, fingerprint="f1")

    d1 = spark.createDataFrame([(3, "a", 5.0)], "k long, g string, x double")
    d2 = spark.createDataFrame([(4, "b", 7.0)], "k long, g string, x double")

    orig = RollupCatalog._meta_with_token
    fired = {"done": False}

    def hooked(self, name):
        meta, tok = orig(self, name)
        if not fired["done"]:
            fired["done"] = True
            cat.refresh(name, d2)  # the competing writer wins
        return meta, tok

    monkeypatch.setattr(RollupCatalog, "_meta_with_token", hooked)
    with pytest.raises(fsops.ConcurrentWriterError):
        cat.refresh("cube", d1)

    def groups():
        return {
            r["g"]: float(r["sx"])
            for r in cat.rewrite(["g"], {"sx": ("sum", "x")}).collect()
        }

    assert groups() == {"a": 10.0, "b": 27.0}  # winner only
    cat.refresh("cube", d1)  # loser retries
    assert groups() == {"a": 15.0, "b": 27.0}


# --- end-to-end: state store commit race -----------------------------------


def test_state_store_commit_race_loses_cleanly(spark, tmp_path, monkeypatch):
    """The fifth structure joins the protocol (r13): a competing
    commit landing inside this writer's read-to-swap window makes the
    manifest CAS lose cleanly, the loser's claimed version dir stays
    unreferenced (vacuum fodder), and a retry lands on top of the
    winner's state."""
    from python_cdc_spark.streaming.state_store import BucketedStateStore

    store = BucketedStateStore(spark, str(tmp_path / "st"))
    store.commit(
        spark.createDataFrame([(1, 10, 0)], "key long, val long, bucket long"), [0]
    )

    orig = fsops.read_json_with_token
    fired = {"done": False}

    def hooked(path, default=None):
        out = orig(path, default)
        if path.endswith("_manifest.json") and not fired["done"]:
            fired["done"] = True
            store.commit(
                spark.createDataFrame(
                    [(2, 20, 1)], "key long, val long, bucket long"
                ),
                [1],
            )  # the competing writer wins
        return out

    monkeypatch.setattr(fsops, "read_json_with_token", hooked)
    with pytest.raises(fsops.ConcurrentWriterError):
        store.commit(
            spark.createDataFrame([(3, 30, 2)], "key long, val long, bucket long"),
            [2],
        )
    monkeypatch.setattr(fsops, "read_json_with_token", orig)
    # winner's state intact, loser contributed nothing
    got = sorted((r["key"], r["val"]) for r in store.read().collect())
    assert got == [(1, 10), (2, 20)]
    # loser retries from a fresh read and lands
    store.commit(
        spark.createDataFrame([(3, 30, 2)], "key long, val long, bucket long"), [2]
    )
    got = sorted((r["key"], r["val"]) for r in store.read().collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    # the losing attempt's claimed version dir is unreferenced; vacuum
    # reclaims it and reads are unaffected
    store.vacuum()
    got = sorted((r["key"], r["val"]) for r in store.read().collect())
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_state_store_crash_replay_claims_next_slot(spark, tmp_path):
    """A crash after the version-dir claim but before the manifest swap
    leaves an orphan v<N>; the replayed batch must claim the NEXT slot
    (never delete the orphan mid-flight — it could be a racing writer's
    committed dir) and commit correctly; vacuum reclaims the orphan."""
    import shutil

    from python_cdc_spark.streaming.state_store import BucketedStateStore

    store = BucketedStateStore(spark, str(tmp_path / "st"))
    v1 = store.commit(
        spark.createDataFrame([(1, 10, 0)], "key long, val long, bucket long"), [0]
    )
    # simulate the crashed attempt's orphan at the next version
    orphan = os.path.join(store.path, f"v{v1 + 1}")
    shutil.copytree(os.path.join(store.path, f"v{v1}"), orphan)
    v2 = store.commit(
        spark.createDataFrame([(1, 11, 0)], "key long, val long, bucket long"), [0]
    )
    assert v2 == v1 + 2  # claimed past the orphan
    assert [(r["key"], r["val"]) for r in store.read().collect()] == [(1, 11)]
    removed = store.vacuum()
    assert any(orphan in r for r in removed)
    assert [(r["key"], r["val"]) for r in store.read().collect()] == [(1, 11)]
