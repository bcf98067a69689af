"""CDC-maintained BM25 index (operators/bm25_index.py): counter
arithmetic + touched-bucket rewrite under I/U/D must equal a
from-scratch rebuild over the post-CDC corpus, touch only the delta's
buckets, reap emptied buckets — and, since the r11 crash-exactness
rework, publish every fold by ONE atomic pointer swap: a crash at any
staged-write point leaves the previous index fully readable, and
replaying a folded tag is a no-op (counter arithmetic is not
replay-idempotent, so the ledger must make it so).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_cdc_spark.operators.bm25_index import (
    _bucket,
    bm25_search,
    build_bm25_index,
    cdc_bm25_update,
    read_df_table,
    read_doclen,
    read_globals,
    read_postings,
    read_ptr,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _delta(spark, rows):
    return spark.createDataFrame(rows, "operation string, doc_id long, text string")


BASE = [
    (1, "join scan filter alpha beta"),
    (2, "merge join gamma"),
    (3, "scan scan scan delta"),
    (4, "filter epsilon"),
    (5, "zeta eta theta"),
]
DELTA = [
    ("DELETE", 3, None),
    ("UPDATE", 2, "filter filter iota"),   # loses join/merge, gains filter
    ("INSERT", 9, "join merge kappa"),
]
POST = [
    (1, "join scan filter alpha beta"),
    (2, "filter filter iota"),
    (4, "filter epsilon"),
    (5, "zeta eta theta"),
    (9, "join merge kappa"),
]
TERMS = ("join", "scan", "filter", "merge")


def _snapshot(spark, path):
    out = {
        "postings": sorted(
            map(tuple, read_postings(spark, path).drop("bucket").collect())
        ),
        "doclen": sorted(map(tuple, read_doclen(spark, path).drop("bucket").collect())),
        "df": sorted(map(tuple, read_df_table(spark, path).collect())),
    }
    g = read_globals(spark, path)
    out["globals"] = (int(g["n_docs"]), int(g["sum_dl"]))
    return out


def test_cdc_fold_equals_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    stats = cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    assert stats["evicted_docs"] == 2 and stats["new_docs"] == 2
    assert stats["n_docs"] == 5 and not stats["replayed"]

    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, POST), rebuilt)
    assert _snapshot(spark, idx) == _snapshot(spark, rebuilt)

    got = sorted(map(tuple, bm25_search(spark, idx, TERMS, 20).collect()))
    want = sorted(map(tuple, bm25_search(spark, rebuilt, TERMS, 20).collect()))
    assert got == want and len(got) > 0


def _current_files(path, table, ptr):
    """bucket → {file: mtime} for the pointer's CURRENT version dirs."""
    out = {}
    for b, v in ptr[table].items():
        sub = os.path.join(path, table, f"b{int(b):04d}_v{int(v):06d}")
        out[int(b)] = {
            f: os.path.getmtime(os.path.join(sub, f))
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        }
    return out


def test_fold_touches_only_delta_buckets(spark, tmp_path):
    """Untouched buckets keep their current directory byte-for-byte —
    the O(touched) claim, pinned the same way as the ANN fold."""
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    delta_buckets = {
        int(r["b"])
        for r in _delta(spark, DELTA)
        .select(_bucket(F.col("doc_id")).alias("b"))
        .distinct()
        .collect()
    }

    before_ptr = read_ptr(idx)
    before = _current_files(idx, "postings", before_ptr)
    cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    after_ptr = read_ptr(idx)
    after = _current_files(idx, "postings", after_ptr)
    untouched = set(before) - delta_buckets
    assert untouched, "fixture must leave some buckets untouched"
    for b in untouched:
        assert after_ptr["postings"][str(b)] == before_ptr["postings"][str(b)]
        assert after[b] == before[b]  # same files, same mtimes
    for b in delta_buckets & set(before):
        assert after_ptr["postings"].get(str(b)) != before_ptr["postings"][str(b)]


def test_emptied_bucket_is_reaped(spark, tmp_path):
    """Deleting every doc drops every bucket from the pointer (and its
    directory from disk), and the index still serves + accepts
    re-inserts."""
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    delta = _delta(spark, [("DELETE", d, None) for d, _ in BASE])
    stats = cdc_bm25_update(spark, idx, delta)
    assert stats["n_docs"] == 0
    ptr = read_ptr(idx)
    assert ptr["postings"] == {} and ptr["doclen"] == {}
    assert not os.listdir(os.path.join(idx, "postings"))
    assert read_globals(spark, idx)["sum_dl"] == 0
    delta2 = _delta(spark, [("INSERT", d, t) for d, t in BASE])
    cdc_bm25_update(spark, idx, delta2)
    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, BASE), rebuilt)
    assert _snapshot(spark, idx) == _snapshot(spark, rebuilt)


def test_replayed_fold_is_noop(spark, tmp_path):
    """Counter arithmetic is not replay-idempotent — the fold ledger
    must make a second fold of the same delta a no-op (the at-least-
    once streaming case, and the crash-after-publish batch case)."""
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    first = cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    assert not first["replayed"]
    snap = _snapshot(spark, idx)
    ptr = read_ptr(idx)
    again = cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    assert again["replayed"] and again["n_docs"] == first["n_docs"]
    assert _snapshot(spark, idx) == snap
    assert read_ptr(idx) == ptr  # not even a new version was published


def test_distinct_delta_same_ids_is_not_a_replay(spark, tmp_path):
    """The tag digests text content, not just (op, id): a SECOND update
    wave over the same ids with different text must fold, not alias the
    first (the dedup-index ADVICE failure mode)."""
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    w1 = _delta(spark, [("UPDATE", 2, "first wave")])
    w2 = _delta(spark, [("UPDATE", 2, "second wave")])
    assert not cdc_bm25_update(spark, idx, w1)["replayed"]
    assert not cdc_bm25_update(spark, idx, w2)["replayed"]
    rebuilt = str(tmp_path / "rebuilt")
    post = [(d, t) for d, t in BASE if d != 2] + [(2, "second wave")]
    build_bm25_index(spark, _corpus(spark, post), rebuilt)
    assert _snapshot(spark, idx) == _snapshot(spark, rebuilt)


def test_crash_before_publish_leaves_old_index_intact(spark, tmp_path, monkeypatch):
    """Kill the fold after every staged write but BEFORE the pointer
    swap: reads must still serve the pre-fold index exactly, and the
    replayed fold must converge to the correct post-state."""
    import python_cdc_spark.operators.bm25_index as mod

    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    snap_before = _snapshot(spark, idx)

    real_write_ptr = mod._write_ptr

    def crash(path, ptr, expected_token=None):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(mod, "_write_ptr", crash)
    with pytest.raises(RuntimeError):
        cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    monkeypatch.setattr(mod, "_write_ptr", real_write_ptr)

    # every staged directory is invisible: the old pointer still rules
    assert _snapshot(spark, idx) == snap_before
    got = sorted(map(tuple, bm25_search(spark, idx, TERMS, 20).collect()))
    rebuilt0 = str(tmp_path / "rebuilt0")
    build_bm25_index(spark, _corpus(spark, BASE), rebuilt0)
    assert got == sorted(map(tuple, bm25_search(spark, rebuilt0, TERMS, 20).collect()))

    # the replay overwrites the orphaned staging dirs and lands cleanly
    stats = cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    assert not stats["replayed"] and stats["n_docs"] == 5
    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, POST), rebuilt)
    assert _snapshot(spark, idx) == _snapshot(spark, rebuilt)


def test_crash_mid_stage_leaves_no_orphans_after_next_fold(spark, tmp_path, monkeypatch):
    """A crash halfway through staging (meta written, buckets partial)
    is cleaned up by the next successful fold's post-publish sweep."""
    import python_cdc_spark.operators.bm25_index as mod

    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)

    # crash INSIDE the fused bucket writer after the postings claims
    # landed but before the doclen claims — the sharpest partial-stage
    # point of the r14 single-write layout (claimed postings dirs + the
    # union staging tree are both orphaned; the pointer never moves)
    real = mod._claim_bucket_slots
    calls = {"n": 0}

    def crash_on_second(path, table, staged_root, allowed, versions):
        calls["n"] += 1
        if calls["n"] == 2:  # postings claimed, doclen about to
            raise RuntimeError("crash mid-stage")
        return real(path, table, staged_root, allowed, versions)

    monkeypatch.setattr(mod, "_claim_bucket_slots", crash_on_second)
    with pytest.raises(RuntimeError):
        cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    monkeypatch.setattr(mod, "_claim_bucket_slots", real)

    cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    ptr = read_ptr(idx)
    live = {
        os.path.join(t, f"b{int(b):04d}_v{int(v):06d}")
        for t in ("postings", "doclen")
        for b, v in ptr[t].items()
    }
    on_disk = {
        os.path.join(t, d)
        for t in ("postings", "doclen")
        for d in os.listdir(os.path.join(idx, t))
    }
    assert on_disk == live  # the sweep reclaimed every orphan
    metas = [d for d in os.listdir(idx) if d.startswith("meta_v")]
    assert metas == [f"meta_v{ptr['meta']:06d}"]


def test_positions_are_stored_and_fold_preserves_them(spark, tmp_path):
    """Positional postings: 1-based sorted in-doc offsets, and a fold's
    kept/evicted/placed rows carry them exactly as a rebuild would."""
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    rows = {
        (r["doc_id"], r["token"]): list(r["positions"])
        for r in read_postings(spark, idx).collect()
    }
    assert rows[(3, "scan")] == [1, 2, 3]
    assert rows[(1, "join")] == [1]
    assert rows[(2, "join")] == [2]
    cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, POST), rebuilt)
    got = sorted(
        (r["doc_id"], r["token"], tuple(r["positions"]))
        for r in read_postings(spark, idx).collect()
    )
    want = sorted(
        (r["doc_id"], r["token"], tuple(r["positions"]))
        for r in read_postings(spark, rebuilt).collect()
    )
    assert got == want
    assert (2, "filter", (1, 2)) in got  # the UPDATE's new image


def test_phrase_search_from_maintained_index(spark, tmp_path):
    """Adjacency-join phrase match over the folded index == over a
    rebuild; repeated-term phrases exercise the distinct-offset rule."""
    from python_cdc_spark.operators.bm25_index import bm25_phrase_search

    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, POST), rebuilt)

    for phrase in [("join", "merge"), ("filter", "filter"), ("scan", "scan")]:
        got = sorted(map(tuple, bm25_phrase_search(spark, idx, phrase, 10).collect()))
        want = sorted(
            map(tuple, bm25_phrase_search(spark, rebuilt, phrase, 10).collect())
        )
        assert got == want
    # ground truth: "join merge" appears only in doc 9's post-state
    hits = {r["doc_id"]: r["phrase_tf"] for r in
            bm25_phrase_search(spark, idx, ("join", "merge"), 10).collect()}
    assert hits == {9: 1}
    # repeated term: "filter filter" occurs once in doc 2's new image
    hits = {r["doc_id"]: r["phrase_tf"] for r in
            bm25_phrase_search(spark, idx, ("filter", "filter"), 10).collect()}
    assert hits == {2: 1}
    # absent phrase: empty result, no error
    assert bm25_phrase_search(spark, idx, ("kappa", "alpha"), 10).count() == 0


def test_positions_off_mode(spark, tmp_path):
    """store_positions=False: same schema (all-null positions), pointer
    records the mode, folds inherit it, term search is row-identical to
    a positional index, phrase search refuses clearly, and the postings
    storage is materially smaller — the documented trade."""
    from python_cdc_spark import fsops
    from python_cdc_spark.operators.bm25_index import bm25_phrase_search

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 200), i -> element_at("
            "array('join','scan','filter','merge','alpha','beta'), "
            "int(pmod(id*7+i, 6))+1)))"
        ).alias("text"),
    )
    on, off = str(tmp_path / "on"), str(tmp_path / "off")
    build_bm25_index(spark, docs, on, store_positions=True)
    build_bm25_index(spark, docs, off, store_positions=False)
    assert read_ptr(on)["pos"] is True and read_ptr(off)["pos"] is False

    def top(path):
        return sorted(map(tuple, bm25_search(spark, path, TERMS, 20).collect()))

    assert top(on) == top(off) and len(top(on)) == 20
    with pytest.raises(ValueError, match="store_positions=False"):
        bm25_phrase_search(spark, off, ("join", "scan"))

    delta = _delta(
        spark,
        [
            ("UPDATE", 5, "join join merge nu"),
            ("DELETE", 10, None),
            ("INSERT", 1000, "scan filter scan xi"),
        ],
    )
    cdc_bm25_update(spark, on, delta)
    cdc_bm25_update(spark, off, delta)
    assert top(on) == top(off)
    # the fold kept the positions-off invariant: every row stays null
    assert (
        read_postings(spark, off).filter(F.col("positions").isNotNull()).count() == 0
    )
    # and the positional index still answers phrases post-fold
    assert bm25_phrase_search(spark, on, ("join", "merge")).count() > 0

    b_on = fsops.tree_bytes(os.path.join(on, "postings"))
    b_off = fsops.tree_bytes(os.path.join(off, "postings"))
    assert b_off < 0.8 * b_on, f"positions-off not smaller: {b_off} vs {b_on}"
