"""CDC-maintained dedup index (operators/incremental_dedup.
cdc_dedup_index_update): an I/U/D document delta folds into the
persisted gram/band index with generation-aware eviction, and the exact
cluster table updates by affected-component recompute — splits from
deletes, merges from inserts, membership moves from updates — always
equal to a from-scratch batch build over the post-CDC corpus.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_cdc_spark.operators.incremental_dedup import (
    build_dedup_index,
    cdc_dedup_index_update,
    compact_dedup_index,
    read_components,
    read_index_table,
    _committed_delta_dirs,
)


def _t(a: int, b: int) -> str:
    return " ".join(f"tok{i}" for i in range(a, b))


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _delta(spark, rows):
    return spark.createDataFrame(rows, "operation string, doc_id long, text string")


def _comps(df_or_spark, idx=None):
    df = df_or_spark if idx is None else read_components(df_or_spark, idx)
    return sorted(map(tuple, df.select("v", "component").collect()))


def _batch_truth(spark, rows, tmp_path, name):
    idx = str(tmp_path / name)
    build_dedup_index(spark, _corpus(spark, rows), idx)
    return _comps(spark, idx)


# Base corpus: a bridged 5-cluster {40..44} (44 = the bridge: deleting
# it must SPLIT the cluster into {40,41} and {42,43}), two 2-clusters
# {10,11} and {20,21} (an inserted bridge must MERGE them), and a loner
# 60 whose UPDATE moves it into {10,11}.
BASE = [
    (40, _t(200, 210)), (41, _t(200, 210)),
    (42, _t(205, 215)), (43, _t(205, 215)),
    (44, _t(200, 215)),
    (10, _t(100, 110)), (11, _t(100, 110)),
    (20, _t(300, 310)), (21, _t(300, 310)),
    (60, _t(400, 410)),
]

DELTA = [
    ("DELETE", 44, None),              # split {40..44} → {40,41}, {42,43}
    ("INSERT", 25, _t(100, 115)),      # merge {10,11} ∪ {20,21}? no — see below
    ("UPDATE", 60, _t(100, 110)),      # 60 joins the {10,11} cluster
]


def _post_rows(base, delta):
    rows = {d: t for d, t in base}
    for op, d, t in delta:
        if op == "DELETE":
            rows.pop(d)
        else:
            rows[d] = t
    return sorted(rows.items())


def test_cdc_fold_split_merge_update_matches_batch(spark, tmp_path):
    """One mixed fold exercising all three structural events: a delete
    that splits a bridged cluster, an insert near an existing cluster,
    and an update that moves a doc between clusters — final components
    must equal the batch build over the post-CDC corpus."""
    # make the insert a true MERGE bridge: {20,21} re-texted to overlap
    # the insert's top half
    base = [(d, _t(105, 115)) if d in (20, 21) else (d, t) for d, t in BASE]
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, base), idx)
    before = dict(_comps(spark, idx))
    # sanity: the scenario is structurally non-trivial
    assert before[40] == before[42] == before[44]  # bridged 5-cluster
    assert before[10] != before.get(20, -1)  # two separate clusters
    assert 60 not in before  # loner

    got = _comps(cdc_dedup_index_update(spark, idx, _delta(spark, DELTA)))
    want = _batch_truth(spark, _post_rows(base, DELTA), tmp_path, "truth")
    assert got == want
    after = dict(got)
    assert after[40] == after[41] and after[42] == after[43]
    assert after[40] != after[42]  # the split happened
    assert after[10] == after[20] == after[25]  # the merge happened
    assert after[60] == after[10]  # the update moved 60 in


def test_eviction_is_generation_aware(spark, tmp_path):
    """An UPDATE must evict the OLD image's gram rows without touching
    its own new image: after the fold the doc appears once, with the
    new text's grams only; a DELETE leaves no rows at all."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    cdc_dedup_index_update(spark, idx, _delta(spark, DELTA))
    cells = read_index_table(spark, idx, "cells")
    # deleted doc: gone from every table
    assert cells.filter(F.col("id") == 44).count() == 0
    assert read_index_table(spark, idx, "sizes").filter(F.col("id") == 44).count() == 0
    # updated doc: exactly the new text's grams (t(100,110) = 8 grams),
    # none of the old t(400,410) grams
    g60 = [r["gram"] for r in cells.filter(F.col("id") == 60).collect()]
    assert len(g60) == len(set(g60)) == 8
    assert all("tok10" in g or "tok1" in g for g in g60)
    assert not any("tok40" in g for g in g60)
    # sizes row reflects the new image
    s60 = read_index_table(spark, idx, "sizes").filter(F.col("id") == 60).collect()
    assert [r["set_size"] for r in s60] == [8]


def test_cdc_fold_replay_is_fixpoint(spark, tmp_path):
    """Replaying the same delta (crash after commit, before/after the
    swap) must reuse the same generation directory and leave components
    and index contents identical."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    delta = _delta(spark, DELTA)
    comps = _comps(cdc_dedup_index_update(spark, idx, delta))
    cells = read_index_table(spark, idx, "cells").count()
    dirs = _committed_delta_dirs(idx)
    assert len(dirs) == 1 and os.path.basename(dirs[0]).startswith("g000001-")

    replay = _comps(cdc_dedup_index_update(spark, idx, delta))
    assert replay == comps == _comps(spark, idx)
    assert read_index_table(spark, idx, "cells").count() == cells
    assert _committed_delta_dirs(idx) == dirs  # same generation reused


def test_streaming_cdc_dedup_matches_batch(spark, tmp_path):
    """STREAMING TWIN: an I/U/D document CDC feed drained in two
    micro-batches through StreamingCdcCorpusDedup must yield exactly
    the components of a batch build over the post-CDC corpus, replays
    must be no-ops, and generations must stack in stream order."""
    from python_cdc_spark.streaming.dedup_stream import StreamingCdcCorpusDedup

    base = [(d, _t(105, 115)) if d in (20, 21) else (d, t) for d, t in BASE]
    feed = tmp_path / "cdcfeed"
    feed.mkdir()
    batch1 = [("DELETE", 44, None), ("INSERT", 25, _t(100, 115))]
    batch2 = [("UPDATE", 60, _t(100, 110)), ("DELETE", 41, None)]
    _delta(spark, batch1).coalesce(1).write.json(str(feed / "f1"))
    _delta(spark, batch2).coalesce(1).write.json(str(feed / "f2"))

    dd = StreamingCdcCorpusDedup(spark, str(tmp_path / "idx"))
    dd.bootstrap(_corpus(spark, base))
    stream = (
        spark.readStream.schema("operation string, doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .json(str(feed))
    )
    q = dd.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = _comps(dd.components())
    want = _batch_truth(
        spark, _post_rows(_post_rows(base, batch1), batch2), tmp_path, "truth_s"
    )
    assert got == want
    dirs = [os.path.basename(d) for d in _committed_delta_dirs(str(tmp_path / "idx"))]
    assert dirs == ["g000001-cdcbatch_0", "g000002-cdcbatch_1"]

    # restarting the drained stream is a contents no-op
    q2 = dd.start(stream, str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    assert _comps(dd.components()) == want
    # a marker-less replay of an already-folded batch (crash before
    # _folded.json committed) re-runs the fold and must be a fixpoint
    os.remove(os.path.join(str(tmp_path / "idx"), "_folded.json"))
    dd.fold_batch(_delta(spark, batch2), batch_id=1)
    assert _comps(dd.components()) == want


_SHAPES = [
    _t(0, 10), _t(0, 15), _t(5, 15),      # a bridged chain family
    _t(100, 110), _t(100, 115),           # a second family
    _t(400, 410),                         # a loner family
]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

base_st = st.dictionaries(st.integers(0, 5), st.integers(0, len(_SHAPES) - 1),
                          min_size=1, max_size=6)
delta_st = st.dictionaries(
    st.integers(0, 15),
    st.tuples(st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
              st.integers(0, len(_SHAPES) - 1)),
    min_size=1, max_size=8,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(base=base_st, delta=delta_st)
def test_cdc_fold_matches_batch_property(spark, tmp_path_factory, base, delta):
    """PROPERTY: for any base corpus over the shape pool and any
    per-key-collapsed I/U/D delta (ops normalized: existing ids can
    only UPDATE/DELETE, new ids only INSERT), one CDC fold equals the
    batch build over the post-CDC corpus exactly."""
    base_rows = [(i, _SHAPES[s]) for i, s in sorted(base.items())]
    delta_rows = []
    for i, (op, s) in sorted(delta.items()):
        if i in base:
            op = "UPDATE" if op == "INSERT" else op
            delta_rows.append((op, i, _SHAPES[s] if op == "UPDATE" else None))
        else:
            delta_rows.append(("INSERT", i, _SHAPES[s]))

    tmp = tmp_path_factory.mktemp("cdcprop")
    idx = str(tmp / "idx")
    build_dedup_index(spark, _corpus(spark, base_rows), idx)
    got = _comps(cdc_dedup_index_update(spark, idx, _delta(spark, delta_rows)))
    want = _batch_truth(spark, _post_rows(base_rows, delta_rows), tmp, "truth")
    assert got == want


def test_second_fold_and_compaction(spark, tmp_path):
    """A second CDC fold (re-inserting a previously deleted doc and
    deleting the merge bridge) stacks generations correctly, and
    compaction materializes the evictions without changing answers."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    cdc_dedup_index_update(spark, idx, _delta(spark, DELTA))
    delta2 = [
        ("INSERT", 44, _t(200, 215)),  # re-bridge: {40,41} ∪ {42,43} re-merge
        ("DELETE", 25, None),
    ]
    got = _comps(cdc_dedup_index_update(spark, idx, _delta(spark, delta2)))
    want = _batch_truth(
        spark, _post_rows(_post_rows(BASE, DELTA), delta2), tmp_path, "truth2"
    )
    assert got == want
    after = dict(got)
    assert after[40] == after[44] == after[42]  # re-merged
    assert 25 not in after

    n_cells = read_index_table(spark, idx, "cells").count()
    assert compact_dedup_index(spark, idx) == 2
    assert read_index_table(spark, idx, "cells").count() == n_cells
    assert _comps(spark, idx) == want
    # compaction materialized the evictions: no evicted ids anywhere
    assert (
        read_index_table(spark, idx, "cells").filter(F.col("id") == 25).count() == 0
    )


def test_second_update_wave_same_ids_is_not_a_replay(spark, tmp_path):
    """r10 ADVICE: the CDC fingerprint digests TEXT, not just (op, id) —
    a second UPDATE wave over the same id multiset with different
    content must land as a NEW generation (not rewrite the first wave's
    directory and let later evicted lists suppress the newest images)."""
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    # wave 1: 60 joins {10,11}; an interleaved fold bumps the generation
    cdc_dedup_index_update(spark, idx, _delta(spark, [("UPDATE", 60, _t(100, 110))]))
    cdc_dedup_index_update(spark, idx, _delta(spark, [("DELETE", 44, None)]))
    # wave 2: SAME (op, id) multiset as wave 1, different text — 60
    # moves on to {20,21}
    cdc_dedup_index_update(spark, idx, _delta(spark, [("UPDATE", 60, _t(300, 310))]))
    dirs = _committed_delta_dirs(idx)
    assert len(dirs) == 3, "wave 2 must be a new generation, not a rewrite"

    post = [(d, t) for d, t in BASE if d not in (44, 60)] + [(60, _t(300, 310))]
    want = _batch_truth(spark, post, tmp_path, "truth")
    assert _comps(spark, idx) == want
    after = dict(_comps(spark, idx))
    assert after[60] == after[20]  # the newest image won


def test_insert_only_fold_refused_after_cdc_fold(spark, tmp_path):
    """r10 ADVICE: the CDC-API-exclusive contract is enforced — an
    insert-only fold after any CDC fold would read as generation 0 and
    have its rows evicted by every existing generation's list."""
    from python_cdc_spark.operators.incremental_dedup import incremental_dedup_update

    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    cdc_dedup_index_update(spark, idx, _delta(spark, [("DELETE", 44, None)]))
    with pytest.raises(ValueError, match="CDC folds"):
        incremental_dedup_update(
            spark, idx, _corpus(spark, [(99, _t(500, 510))])
        )


def test_wide_delta_reroutes_to_full_recompute_and_matches_batch(spark, tmp_path, monkeypatch):
    """r10 verdict #6: past the affected-fraction crossover the fold
    takes one unrestricted candidate pass over the stored post-change
    tables instead of the members-restricted subgraph — cost placement
    changes, results must not. Force the crossover low to pin that the
    reroute path itself is exact."""
    import python_cdc_spark.operators.incremental_dedup as mod

    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    monkeypatch.setattr(mod, "_AFFECTED_REBUILD_FRACTION", 0.0)  # always reroute
    got = _comps(cdc_dedup_index_update(spark, idx, _delta(spark, DELTA)))
    want = _batch_truth(spark, _post_rows(BASE, DELTA), tmp_path, "truth")
    assert got == want
    assert _comps(spark, idx) == want  # the swap published the reroute's result


def test_fold_then_inverse_fold_restores_index_content(spark, tmp_path):
    """Fold-exactness property (r12 verdict #5's invariant, pinned at
    the operator level): folding ``narrow_delta`` and then its exact
    inverse must return the index CONTENT — components and sizes — to
    the pre-fold state, even though the rows now live in delta dirs."""
    from python_cdc_spark.io import table
    from python_cdc_spark.queries.llm_text import inverse_narrow_delta, narrow_delta

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, docs, idx)

    def content():
        comps = sorted(map(tuple, read_components(spark, idx).collect()))
        sizes = sorted(
            map(tuple, read_index_table(spark, idx, "sizes").collect())
        )
        return comps, sizes

    pre = content()
    cdc_dedup_index_update(spark, idx, narrow_delta(docs), batch_tag="d1")
    mid = content()
    assert mid[0] != pre[0] or mid[1] != pre[1]  # the delta did something
    cdc_dedup_index_update(spark, idx, inverse_narrow_delta(docs), batch_tag="d2")
    assert content() == pre


def test_hardlink_fixture_fold_leaves_source_pristine(spark, tmp_path):
    """The narrow gates' work dirs are HARDLINK trees of the pristine
    cache (helpers.cached_pristine_base): a fold in the work dir must
    leave every byte of the source index untouched — the immutability
    argument (data files never mutate; pointers replace via rename)
    verified end-to-end."""
    import hashlib
    import shutil

    def tree_digest(root):
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for f in sorted(filenames):
                p = os.path.join(dirpath, f)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    src = str(tmp_path / "src")
    build_dedup_index(spark, _corpus(spark, BASE), src)
    before = tree_digest(src)

    work = str(tmp_path / "work")
    shutil.copytree(src, work, copy_function=os.link)
    cdc_dedup_index_update(spark, work, _delta(spark, DELTA))
    assert tree_digest(src) == before
    # and the fold in the work copy is the real fold
    got = _comps(spark, work)
    want = _batch_truth(spark, _post_rows(BASE, DELTA), tmp_path, "truth")
    assert got == want


def test_pointer_tracked_corpus_count_matches_exact(spark, tmp_path):
    """r13: the reroute-fraction denominator comes from pointer
    metadata (_corpus_count: base n_docs ± per-delta counts) instead of
    an O(corpus) sizes scan per fold. On clean I/U/D feeds (every
    DELETE hits a live id, every INSERT is new) the estimate must EQUAL
    the exact sizes count after build, after folds, and after
    compaction resets it."""
    from python_cdc_spark.operators.incremental_dedup import (
        _corpus_count,
        _read_base_ptr,
    )

    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)

    def exact():
        return read_index_table(spark, idx, "sizes").count()

    def tracked():
        return _corpus_count(spark, idx, _read_base_ptr(idx))

    assert tracked() == exact() == len(BASE)
    cdc_dedup_index_update(spark, idx, _delta(spark, DELTA))
    assert tracked() == exact()  # -1 delete, +1 insert, update net 0
    cdc_dedup_index_update(
        spark, idx, _delta(spark, [("INSERT", 90, _t(500, 510))])
    )
    assert tracked() == exact()
    compact_dedup_index(spark, idx)
    assert _read_base_ptr(idx)["n_docs"] == exact()
    assert tracked() == exact()


def test_shared_read_matches_per_table_reads(spark, tmp_path):
    """r13: read_index_tables shares one distinct evicted frame per
    generation boundary across the three tables. On an index with TWO
    CDC generations (so base rows see a two-dir evicted union and gen-1
    rows a one-dir one) the shared read must return exactly the rows of
    the independent per-table reads."""
    from python_cdc_spark.operators.incremental_dedup import read_index_tables

    idx = str(tmp_path / "idx")
    build_dedup_index(spark, _corpus(spark, BASE), idx)
    cdc_dedup_index_update(spark, idx, _delta(spark, DELTA))
    cdc_dedup_index_update(
        spark,
        idx,
        _delta(spark, [("UPDATE", 10, _t(600, 610)), ("DELETE", 21, None)]),
    )
    assert len(_committed_delta_dirs(idx)) == 2  # two generations live
    tabs = read_index_tables(spark, idx)
    for name in ("cells", "bands", "sizes"):
        shared = sorted(map(tuple, tabs[name].collect()))
        single = sorted(map(tuple, read_index_table(spark, idx, name).collect()))
        assert shared == single, name
    # eviction still generation-aware through the shared path: the old
    # images of 10 (updated in gen 2) and 21/44 (deleted) are gone
    ids = {r["id"] for r in tabs["sizes"].collect()}
    assert 44 not in ids and 21 not in ids and 10 in ids
