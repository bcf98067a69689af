"""CDC-maintained BM25 index (operators/bm25_index.py): counter
arithmetic + touched-bucket rewrite under I/U/D must equal a
from-scratch rebuild over the post-CDC corpus, touch only the delta's
buckets, and reap emptied buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from python_cdc_spark.operators.bm25_index import (
    _bucket,
    bm25_search,
    build_bm25_index,
    cdc_bm25_update,
    read_globals,
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
    out = {}
    for name in ("postings.parquet", "doclen.parquet"):
        t = spark.read.parquet(os.path.join(path, name))
        cols = [c for c in t.columns if c != "bucket"]
        out[name] = sorted(map(tuple, t.select(*cols).collect()))
    g = read_globals(spark, path)
    out["globals"] = (int(g["n_docs"]), int(g["sum_dl"]))
    out["df"] = sorted(
        map(tuple, spark.read.parquet(os.path.join(path, "df.parquet")).collect())
    )
    return out


def test_cdc_fold_equals_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    stats = cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    assert stats["evicted_docs"] == 2 and stats["new_docs"] == 2
    assert stats["n_docs"] == 5

    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, POST), rebuilt)
    assert _snapshot(spark, idx) == _snapshot(spark, rebuilt)

    got = sorted(map(tuple, bm25_search(spark, idx, TERMS, 20).collect()))
    want = sorted(map(tuple, bm25_search(spark, rebuilt, TERMS, 20).collect()))
    assert got == want and len(got) > 0


def test_fold_touches_only_delta_buckets(spark, tmp_path):
    """Untouched bucket directories keep their files byte-for-byte —
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

    def files(base):
        out = {}
        for d in os.listdir(base):
            if d.startswith("bucket="):
                b = int(d.split("=")[1])
                sub = os.path.join(base, d)
                out[b] = {
                    f: os.path.getmtime(os.path.join(sub, f))
                    for f in os.listdir(sub)
                    if f.endswith(".parquet")
                }
        return out

    postings = os.path.join(idx, "postings.parquet")
    before = files(postings)
    cdc_bm25_update(spark, idx, _delta(spark, DELTA))
    after = files(postings)
    untouched = set(before) - delta_buckets
    assert untouched, "fixture must leave some buckets untouched"
    for b in untouched:
        assert after[b] == before[b]  # same files, same mtimes
    for b in delta_buckets & set(before):
        assert after.get(b) != before[b]


def test_emptied_bucket_is_reaped(spark, tmp_path):
    """Deleting every doc of a bucket removes its directory entirely."""
    idx = str(tmp_path / "idx")
    build_bm25_index(spark, _corpus(spark, BASE), idx)
    # delete ALL docs → every bucket dir must vanish
    delta = _delta(spark, [("DELETE", d, None) for d, _ in BASE])
    stats = cdc_bm25_update(spark, idx, delta)
    assert stats["n_docs"] == 0
    postings = os.path.join(idx, "postings.parquet")
    assert not any(d.startswith("bucket=") for d in os.listdir(postings))
    assert read_globals(spark, idx)["sum_dl"] == 0
    # and the index still serves (empty) searches + accepts re-inserts
    delta2 = _delta(spark, [("INSERT", d, t) for d, t in BASE])
    cdc_bm25_update(spark, idx, delta2)
    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(spark, _corpus(spark, BASE), rebuilt)
    assert _snapshot(spark, idx) == _snapshot(spark, rebuilt)
