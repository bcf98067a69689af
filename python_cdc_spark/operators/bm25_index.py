"""CDC-maintained BM25 text index: postings + stats under I/U/D.

The fourth CDC-maintained structure (rollup cube, ANN lists, dedup
index, now the text-search index): a persisted inverted index whose
postings, document lengths, document frequencies, and corpus stats
track a replicated corpus through INSERT/UPDATE/DELETE in
O(delta + touched buckets), never O(corpus).

Everything BM25 needs is ALGEBRAIC, which makes this the simplest of
the four folds:

- ``postings`` (token, doc_id, tf) and ``doclen`` (doc_id, dl) live in
  per-bucket version directories keyed by ``bucket = crc32(doc_id) %
  N`` — and because the bucket is a pure function of the id, a fold
  knows its touched partitions from the DELTA ALONE (the ANN fold
  needs a victim-location scan; here there is nothing to look up).
  Only touched buckets get new version directories — untouched buckets
  keep their current directory byte-for-byte.
- ``df`` (token → document frequency) updates by counter arithmetic:
  +1 per (token, new doc), −1 per (token, evicted doc), where the
  evicted docs' tokens come from the touched buckets' postings (a
  directory-pruned read, delta-scale). Vocabulary-scale table,
  rewritten whole (bounded: vocab grows ~log corpus).
- ``globals`` (n_docs, sum_dl) updates by two additions.

Crash exactness (r10 verdict #2 / ADVICE): counter arithmetic is NOT
replay-idempotent, so the fold is staged-then-published — all new
bucket directories and the new meta (df + globals) version are written
first, then ONE atomic ``os.replace`` of the ``_ptr`` manifest makes
the whole fold visible: {meta version, bucket → version map, folded
tags}. A crash at any earlier point leaves the previous pointer — and
therefore a fully consistent previous index — in place; deleting the
superseded directories afterward is pure cleanup, retried by the next
fold. Replays are no-ops via the content-tag ledger in the pointer
(streaming passes explicit ``cdcbatch_<id>`` tags; the batch path
derives a tag from a digest over op, id, AND text — text included so
two different deltas over the same id multiset cannot collide).

Search (``bm25_search``) reproduces the registered
``text_bm25_search`` scoring exactly — rational idf
(N − df + 0.5)/(df + 0.5) with no log, per-term contribution routed
through DECIMAL(18,9) before the per-doc sum — so a maintained index
answers bit-identically to a from-scratch computation over the same
corpus, and the DuckDB oracle can gate it. At 100 TB the postings
filter ``token IN (...)`` is a pushed predicate over the touched
bucket files, and the doclen read is DIRECTORY-PRUNED to the buckets
the matched postings actually hit (a ≤N_BUCKETS-element metadata
collect) — a rare-term query reads a handful of doclen directories,
not the corpus.

Single writer; LOCAL path (same constraint as the other maintained
structures: the pointer uses ``os`` primitives while parquet goes
through Spark's Hadoop FS).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.functions.text import tokens

_N_BUCKETS = 64
_PTR = "_ptr"
_POSTINGS_SCHEMA = "doc_id long, token string, tf long, bucket int"
_DOCLEN_SCHEMA = "doc_id long, dl long, bucket int"


def _bucket(col: F.Column) -> F.Column:
    return (F.crc32(col.cast("string")) % _N_BUCKETS).cast("int")


def _doc_tables(docs: DataFrame, text_col: str, id_col: str) -> tuple[DataFrame, DataFrame]:
    """(token, doc_id, tf) and (doc_id, dl) — the same tokenization the
    registered BM25 query (and its oracle twin) uses."""
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf, dl


# --- pointer ---------------------------------------------------------------


def _ptr_path(path: str) -> str:
    return os.path.join(path, _PTR)


def read_ptr(path: str) -> dict:
    """{"meta": M, "postings": {b: v}, "doclen": {b: v}, "folds": [...]}"""
    try:
        with open(_ptr_path(path)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"meta": -1, "postings": {}, "doclen": {}, "folds": []}


def _write_ptr(path: str, ptr: dict) -> None:
    tmp = _ptr_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ptr, f)
    os.replace(tmp, _ptr_path(path))


def _bucket_dir(path: str, table: str, bucket: int, version: int) -> str:
    return os.path.join(path, table, f"b{int(bucket):04d}_v{int(version):06d}")


def _meta_dir(path: str, version: int) -> str:
    return os.path.join(path, f"meta_v{int(version):06d}")


def _cleanup(path: str, ptr: dict) -> None:
    """Delete every directory the pointer does not reference — old
    versions of rewritten buckets, superseded meta, and partial writes
    from a crashed fold. Pure cleanup: readers only follow the pointer,
    so a crash mid-cleanup costs disk, never correctness."""
    live = {os.path.relpath(_meta_dir(path, ptr["meta"]), path)} if ptr["meta"] >= 0 else set()
    for table in ("postings", "doclen"):
        for b, v in ptr[table].items():
            live.add(os.path.relpath(_bucket_dir(path, table, int(b), v), path))
    for entry in os.listdir(path):
        if entry.startswith("meta_v") and entry not in live:
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
    for table in ("postings", "doclen"):
        root = os.path.join(path, table)
        if not os.path.isdir(root):
            continue
        for entry in os.listdir(root):
            if os.path.join(table, entry) not in live:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)


# --- reads -----------------------------------------------------------------


def _read_table(
    spark: SparkSession,
    path: str,
    table: str,
    schema: str,
    ptr: dict | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Current rows of postings/doclen, optionally pruned to a bucket
    subset — pruning is directory enumeration, so unprobed buckets are
    never opened (the 100 TB read path)."""
    ptr = ptr if ptr is not None else read_ptr(path)
    want = None if buckets is None else {int(b) for b in buckets}
    dirs = [
        _bucket_dir(path, table, int(b), v)
        for b, v in ptr[table].items()
        if want is None or int(b) in want
    ]
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*dirs)


def read_postings(spark: SparkSession, path: str, buckets: list[int] | None = None) -> DataFrame:
    return _read_table(spark, path, "postings", _POSTINGS_SCHEMA, buckets=buckets)


def read_doclen(spark: SparkSession, path: str, buckets: list[int] | None = None) -> DataFrame:
    return _read_table(spark, path, "doclen", _DOCLEN_SCHEMA, buckets=buckets)


def read_df_table(spark: SparkSession, path: str) -> DataFrame:
    ptr = read_ptr(path)
    return spark.read.parquet(os.path.join(_meta_dir(path, ptr["meta"]), "df.parquet"))


def read_globals(spark: SparkSession, path: str):
    ptr = read_ptr(path)
    return spark.read.parquet(
        os.path.join(_meta_dir(path, ptr["meta"]), "globals.parquet")
    ).first()


def _write_meta(
    spark: SparkSession, path: str, version: int, df_table: DataFrame, n_docs: int, sum_dl: int
) -> None:
    meta = _meta_dir(path, version)
    df_table.write.mode("overwrite").parquet(os.path.join(meta, "df.parquet"))
    spark.createDataFrame(
        [(int(n_docs), int(sum_dl))], "n_docs long, sum_dl long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(meta, "globals.parquet"))


def _write_buckets(
    path: str, table: str, frame: DataFrame, touched: list[int], versions: dict
) -> dict[str, int]:
    """Stage new version dirs for ``touched`` buckets in ONE Spark write
    (``partitionBy`` into a transient staging dir, then metadata-only
    renames into the versioned locations — not one job per bucket).
    Buckets emptied by the fold simply get no directory (and leave the
    pointer map). Returns the updated bucket→version entries
    (stringified keys, JSON round-trip-stable)."""
    staging = os.path.join(path, table, "_staging")
    shutil.rmtree(staging, ignore_errors=True)
    # duplicate the partition column so the data files keep ``bucket``
    # (partitionBy lifts its column out of the files)
    frame.withColumn("pb", F.col("bucket")).write.partitionBy("pb").mode(
        "overwrite"
    ).parquet(staging)
    out = {}
    for entry in os.listdir(staging):
        if not entry.startswith("pb="):
            continue
        b = int(entry.split("=", 1)[1])
        v = int(versions.get(str(b), -1)) + 1
        dst = _bucket_dir(path, table, b, v)
        shutil.rmtree(dst, ignore_errors=True)  # crashed prior attempt
        os.replace(os.path.join(staging, entry), dst)
        out[str(b)] = v
    shutil.rmtree(staging, ignore_errors=True)
    return out


# --- build / fold ----------------------------------------------------------


def build_bm25_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Batch bootstrap: bucketed postings + doclen, df, globals — staged
    fully, then published by one pointer swap (rebuild over a live index
    is itself crash-safe: readers keep the old pointer until the swap)."""
    old = read_ptr(path)
    tf, dl = _doc_tables(docs, text_col, id_col)
    tf = tf.withColumn("bucket", _bucket(F.col("doc_id"))).localCheckpoint(eager=True)
    dl = dl.withColumn("bucket", _bucket(F.col("doc_id"))).localCheckpoint(eager=True)
    meta_v = old["meta"] + 1
    # versions continue past the previous generation's, so staging can
    # never overwrite a directory the live pointer still references
    ptr = {
        "meta": meta_v,
        "postings": _write_buckets(
            path, "postings", tf, list(range(_N_BUCKETS)), old["postings"]
        ),
        "doclen": _write_buckets(
            path, "doclen", dl, list(range(_N_BUCKETS)), old["doclen"]
        ),
        "folds": [],
    }
    df_table = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    g = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).first()
    _write_meta(spark, path, meta_v, df_table, g["n"] or 0, g["s"] or 0)
    _write_ptr(path, ptr)
    _cleanup(path, ptr)
    return int(g["n"] or 0)


def cdc_bm25_update(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    op_col: str = "operation",
    batch_tag: str | None = None,
) -> dict:
    """Fold an I/U/D document delta into the index. Returns fold stats
    (touched/total buckets, counter movements) for receipts.

    All-or-nothing: new bucket + meta directories are staged, then the
    pointer swap publishes them atomically. Replaying a folded tag
    (crash after publish, or an at-least-once stream redelivering a
    batch) is a no-op via the pointer's fold ledger.
    """
    delta = delta.select(
        F.col(op_col).alias("__op"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias(text_col),
    ).localCheckpoint(eager=True)
    tag = batch_tag if batch_tag is not None else _delta_tag(delta, text_col)
    ptr = read_ptr(path)
    if tag in ptr["folds"]:
        return {"replayed": True, "tag": tag, "n_docs": int(read_globals(spark, path)["n_docs"])}

    # evict-then-place (the ANN fold's discipline): every delta id's old
    # image leaves before I/U images land, so an INSERT for an id that
    # already exists upserts instead of silently double-counting
    victims = delta.select("doc_id").distinct().localCheckpoint(eager=True)
    new_docs = delta.filter(F.col("__op").isin("INSERT", "UPDATE")).select(
        "doc_id", text_col
    )
    new_tf, new_dl = _doc_tables(new_docs, text_col, "doc_id")
    new_tf = new_tf.localCheckpoint(eager=True)
    new_dl = new_dl.localCheckpoint(eager=True)

    # touched buckets are a pure function of the delta's ids
    touched = sorted(
        {
            int(r["b"])
            for r in delta.select(_bucket(F.col("doc_id")).alias("b"))
            .distinct()
            .collect()
        }
    )
    tp = _read_table(spark, path, "postings", _POSTINGS_SCHEMA, ptr, touched)
    td = _read_table(spark, path, "doclen", _DOCLEN_SCHEMA, ptr, touched)

    evicted_tf = tp.join(F.broadcast(victims), "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    evicted_dl = td.join(F.broadcast(victims), "doc_id", "left_semi").localCheckpoint(
        eager=True
    )

    # --- counters -----------------------------------------------------
    plus = new_tf.groupBy("token").agg(F.count(F.lit(1)).alias("p"))
    minus = evicted_tf.groupBy("token").agg(F.count(F.lit(1)).alias("m"))
    old_df = read_df_table(spark, path)
    new_df = (
        old_df.join(plus, "token", "full_outer")
        .join(minus, "token", "full_outer")
        .select(
            "token",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("p"), F.lit(0))
                - F.coalesce(F.col("m"), F.lit(0))
            ).alias("df"),
        )
        .filter(F.col("df") > 0)
    )
    g = read_globals(spark, path)
    ev = evicted_dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).first()
    nw = new_dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).first()
    n_docs = int(g["n_docs"]) - int(ev["n"] or 0) + int(nw["n"] or 0)
    sum_dl = int(g["sum_dl"]) - int(ev["s"] or 0) + int(nw["s"] or 0)

    # --- stage touched buckets + meta, then publish --------------------
    new_postings = tp.join(F.broadcast(victims), "doc_id", "left_anti").unionByName(
        new_tf.withColumn("bucket", _bucket(F.col("doc_id")))
    )
    new_doclen = td.join(F.broadcast(victims), "doc_id", "left_anti").unionByName(
        new_dl.withColumn("bucket", _bucket(F.col("doc_id")))
    )
    meta_v = ptr["meta"] + 1
    _write_meta(spark, path, meta_v, new_df, n_docs, sum_dl)
    p_entries = _write_buckets(path, "postings", new_postings, touched, ptr["postings"])
    d_entries = _write_buckets(path, "doclen", new_doclen, touched, ptr["doclen"])
    nxt = {
        "meta": meta_v,
        "postings": {
            **{b: v for b, v in ptr["postings"].items() if int(b) not in touched},
            **p_entries,
        },
        "doclen": {
            **{b: v for b, v in ptr["doclen"].items() if int(b) not in touched},
            **d_entries,
        },
        # ledger bounded at 64: a replay can only be the crashed latest
        # fold (batch) or a post-checkpoint redelivery (streaming, ≤ a
        # few batches) — far inside the window, and the pointer stays KB
        "folds": (ptr["folds"] + [tag])[-64:],
    }
    _write_ptr(path, nxt)  # the commit point
    _cleanup(path, nxt)
    return {
        "replayed": False,
        "tag": tag,
        "touched_buckets": len(touched),
        "total_buckets": _N_BUCKETS,
        "evicted_docs": int(ev["n"] or 0),
        "new_docs": int(nw["n"] or 0),
        "n_docs": n_docs,
    }


def _delta_tag(delta: DataFrame, text_col: str) -> str:
    """Content tag over (op, id, text): commutative 60-bit digest sums,
    stable across partitionings/replays of the same delta, and distinct
    for a different delta over the same ids (the dedup-index ADVICE
    lesson: an id-only digest lets a second UPDATE wave alias the
    first)."""
    key = F.concat_ws(
        ":",
        F.col("__op"),
        F.col("doc_id").cast("string"),
        F.coalesce(F.col(text_col), F.lit("\x00")),
    )
    row = delta.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.conv(F.substring(F.sha2(key, 256), 1, 15), 16, 10).cast("decimal(38,0)")
        ).alias("d1"),
        F.sum(
            F.conv(F.substring(F.sha2(key, 256), 17, 15), 16, 10).cast("decimal(38,0)")
        ).alias("d2"),
    ).first()
    return f"n{row['n']}_a{row['d1']}_b{row['d2']}"


# --- search ----------------------------------------------------------------


def bm25_search(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 retrieval from the maintained index — scoring
    identical to the registered ``text_bm25_search`` (rational idf, per
    -term DECIMAL(18,9) routing, (score DESC, doc_id) tiebreak).

    The doclen read is pruned to the buckets the term-matched postings
    hit (≤ N_BUCKETS ids collected, metadata-scale), so a rare-term
    query never scans corpus-scale doclen. The global top-k window is
    compiled by Spark's InferWindowGroupLimit to
    ``TakeOrderedAndProject(limit=k)`` — pinned in tests/test_plans.py.
    """
    from pyspark.sql import Window

    g = read_globals(spark, path)
    n_docs, sum_dl = int(g["n_docs"]), int(g["sum_dl"])
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0
    ptr = read_ptr(path)
    df_t = read_df_table(spark, path).filter(F.col("token").isin(*terms))
    tf = (
        _read_table(spark, path, "postings", _POSTINGS_SCHEMA, ptr)
        .filter(F.col("token").isin(*terms))
        .select("doc_id", "token", "tf", "bucket")
        .localCheckpoint(eager=True)  # scanned twice: bucket probe + join
    )
    hit_buckets = [int(r["bucket"]) for r in tf.select("bucket").distinct().collect()]
    dl = _read_table(spark, path, "doclen", _DOCLEN_SCHEMA, ptr, hit_buckets).select(
        "doc_id", "dl"
    )
    contrib = (
        tf.select("doc_id", "token", "tf")
        .join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                ((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
            ).cast("decimal(18,9)").alias("c"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("c").cast("double").alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
