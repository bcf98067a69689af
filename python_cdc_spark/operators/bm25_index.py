"""CDC-maintained BM25 text index: positional postings + stats under I/U/D.

The fourth CDC-maintained structure (rollup cube, ANN lists, dedup
index, now the text-search index): a persisted inverted index whose
postings, document lengths, document frequencies, and corpus stats
track a replicated corpus through INSERT/UPDATE/DELETE in
O(delta + touched buckets), never O(corpus).

Everything BM25 needs is ALGEBRAIC, which makes this the simplest of
the four folds:

- ``postings`` (token, doc_id, tf, positions) live in per-bucket
  version directories keyed by ``bucket = crc32(doc_id) % N`` — and
  because the bucket is a pure function of the id, a fold knows its
  touched partitions from the DELTA ALONE (the ANN fold needs a
  victim-location scan; here there is nothing to look up). Only
  touched buckets get new version directories — untouched buckets
  keep their current directory byte-for-byte. ``positions`` holds the
  token's 1-based in-document offsets (sorted), so the index answers
  PHRASE queries by adjacency join — and a fold preserves positions
  for free, since eviction and placement are row-level.
- ``doclen`` (doc_id, dl) is DERIVED: dl == Σ tf over the doc's
  postings, so the fold never reads the old doclen buckets at all —
  kept + new postings rows regroup into the touched buckets' new
  doclen directories in the same pass.
- ``df`` (token → document frequency) updates by counter arithmetic:
  +1 per (token, new doc), −1 per (token, evicted doc), where the
  evicted docs' tokens come from the touched buckets' postings (a
  directory-pruned read, delta-scale). Vocabulary-scale table,
  rewritten whole (bounded: vocab grows ~log corpus).
- ``globals`` (n_docs, sum_dl) updates by two additions.

Fold shape (r11 verdict #2: ONE multi-output pass, not ~12 sequential
jobs): the checkpointed delta yields tag + touched buckets in one
aggregate; then ONE combined frame — tokenized new postings ∪ the
touched buckets' old postings flagged evicted-or-kept — is
materialized once, and every output (df deltas, globals deltas, new
postings buckets, new doclen buckets) derives from it lazily. Eight
Spark jobs total, four of which are the output writes themselves.

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
corpus, and the DuckDB oracle can gate it. ``bm25_phrase_search``
does the same for an exact phrase: anchor = position − term offset,
a doc position where every phrase term lands on the same anchor is
one occurrence; scoring is BM25 over the phrase's occurrence counts.
At 100 TB the postings filter ``token IN (...)`` is a pushed
predicate over the touched bucket files, and the doclen read is
DIRECTORY-PRUNED to the buckets the matched postings actually hit
(a ≤N_BUCKETS-element metadata collect) — a rare-term query reads a
handful of doclen directories, not the corpus.

Positions are OPTIONAL (``build_bm25_index(store_positions=False)``):
a positions-off index stores the same schema with an all-null
positions column (~2× smaller postings), folds inherit the mode from
the pointer, term search is unchanged in results and plan (it never
selects positions — the parquet read is column-pruned either way),
and phrase search refuses the index with a clear error instead of
returning an empty result. The trade: pay positional storage only for
corpora that serve phrase queries.

Single writer; LOCAL path (same constraint as the other maintained
structures: the pointer uses ``os`` primitives while parquet goes
through Spark's Hadoop FS).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark import fsops
from python_cdc_spark.functions.literals import literal_df
from python_cdc_spark.functions.text import tokens


def phrase_df(spark: SparkSession, phrase: tuple[str, ...]) -> DataFrame:
    """(i, term) rows for a phrase, 1-based — JVM-side literal table."""
    return literal_df(
        spark,
        [(i + 1, t) for i, t in enumerate(phrase)],
        [("i", "int"), ("term", "string")],
    )

_N_BUCKETS = 64
_PTR = "_ptr"
_POSTINGS_SCHEMA = "doc_id long, token string, tf long, positions array<int>, bucket int"
_DOCLEN_SCHEMA = "doc_id long, dl long, bucket int"


def _bucket(col: F.Column) -> F.Column:
    return (F.crc32(col.cast("string")) % _N_BUCKETS).cast("int")


def _doc_tf(
    docs: DataFrame, text_col: str, id_col: str, with_positions: bool = True
) -> DataFrame:
    """(doc_id, token, tf, positions, bucket) — the same tokenization the
    registered BM25 query (and its oracle twin) uses; positions are the
    token's 1-based offsets, sorted (collect_list order is partition-
    dependent, the sort makes the stored bytes deterministic).

    ``with_positions=False`` (a positions-OFF index) emits a NULL
    positions column: the schema stays identical, so folds and reads
    never branch, but the parquet column is all-null (~2× smaller
    postings — the documented storage/feature trade: term search never
    reads positions either way, phrase search requires them)."""
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    if not with_positions:
        return (
            tok.groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .withColumn("positions", F.lit(None).cast("array<int>"))
            .withColumn("bucket", _bucket(F.col("doc_id")))
        )
    return tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sort_array(F.collect_list((F.col("pos") + 1).cast("int"))).alias("positions"),
    ).withColumn("bucket", _bucket(F.col("doc_id")))


def _doclen_of(postings: DataFrame) -> DataFrame:
    """doclen is derivable: dl == Σ tf per doc (total token count)."""
    return (
        postings.groupBy("doc_id", "bucket")
        .agg(F.sum("tf").cast("long").alias("dl"))
        .select("doc_id", "dl", "bucket")
    )


# --- pointer ---------------------------------------------------------------


def _ptr_path(path: str) -> str:
    return os.path.join(path, _PTR)


def read_ptr(path: str) -> dict:
    """{"meta": M, "postings": {b: v}, "doclen": {b: v}, "folds": [...],
    "pos": bool} — ``pos`` records whether this index stores positional
    postings (absent in pre-r12 pointers ⇒ True, positions were always
    stored then); folds inherit it, phrase search requires it."""
    return _read_ptr_with_token(path)[0]


def _read_ptr_with_token(path: str) -> tuple[dict, object]:
    """Pointer plus its identity token — every writer reads through
    this so its eventual ``_write_ptr`` can be conditional (optimistic
    concurrency at the pointer swap; fsops.cas_publish)."""
    ptr, tok = fsops.read_json_with_token(
        _ptr_path(path),
        {"meta": -1, "postings": {}, "doclen": {}, "folds": [], "pos": True},
    )
    ptr.setdefault("pos", True)
    return ptr, tok


def _write_ptr(path: str, ptr: dict, expected_token: object) -> None:
    """The commit point: conditional on the pointer not having moved
    since this writer's read — two racing folds/builds resolve to
    exactly one winner, the loser raising ConcurrentWriterError with
    its staged dirs left for vacuum."""
    fsops.cas_publish(_ptr_path(path), ptr, expected_token)


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
    for entry in fsops.list_dir(path):
        if entry.startswith("meta_v") and entry not in live:
            fsops.remove_tree(os.path.join(path, entry))
        elif entry.startswith(("_meta_staging_", "_union_staging_")) and (
            fsops.staging_is_stale(os.path.join(path, entry))
        ):
            # a crashed writer's private staging never got claimed;
            # YOUNG staging may belong to a live concurrent writer —
            # never sweep it mid-write (age gate, fsops.STAGING_TTL_SECS)
            fsops.remove_tree(os.path.join(path, entry))
    for table in ("postings", "doclen"):
        root = os.path.join(path, table)
        for entry in fsops.list_dir(root):
            if entry.startswith("_staging_"):
                if fsops.staging_is_stale(os.path.join(root, entry)):
                    fsops.remove_tree(os.path.join(root, entry))
            elif os.path.join(table, entry) not in live:
                fsops.remove_tree(os.path.join(root, entry))


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
    # explicit schema (the bucket layout is fixed): skips the one-job
    # parquet footer inference Spark runs per schemaless read call
    return spark.read.schema(schema).parquet(*dirs)


def read_postings(spark: SparkSession, path: str, buckets: list[int] | None = None) -> DataFrame:
    return _read_table(spark, path, "postings", _POSTINGS_SCHEMA, buckets=buckets)


def read_doclen(spark: SparkSession, path: str, buckets: list[int] | None = None) -> DataFrame:
    return _read_table(spark, path, "doclen", _DOCLEN_SCHEMA, buckets=buckets)


def read_df_table(spark: SparkSession, path: str) -> DataFrame:
    ptr = read_ptr(path)
    return spark.read.schema("token string, df long").parquet(
        os.path.join(_meta_dir(path, ptr["meta"]), "df.parquet")
    )


def read_globals(spark: SparkSession, path: str):
    """``{"n_docs": int, "sum_dl": int}``. Two counters do not need a
    parquet file and a Spark job per read: since r14 they ride in the
    pointer itself (same atomic publish; the pointer swap was already
    the commit point for the meta version that carried them). Legacy
    indexes (pre-r14 pointers without a ``globals`` key) fall back to
    the old per-meta-version ``globals.parquet``."""
    ptr = read_ptr(path)
    g = ptr.get("globals")
    if g is not None:
        return {"n_docs": int(g["n_docs"]), "sum_dl": int(g["sum_dl"])}
    row = (
        spark.read.schema("n_docs long, sum_dl long")
        .parquet(os.path.join(_meta_dir(path, ptr["meta"]), "globals.parquet"))
        .first()
    )
    return {"n_docs": int(row["n_docs"]), "sum_dl": int(row["sum_dl"])}


def _write_meta(
    spark: SparkSession, path: str, version: int, df_table: DataFrame
) -> int:
    """Stage the df table into a writer-private dir, then claim the
    first free ``meta_v*`` slot at-or-past the hinted version (racing
    writers never clobber each other). Returns the CLAIMED version —
    the pointer must record this, not the hint. The two corpus globals
    ride in the pointer (read_globals), not in a parquet file here —
    one fewer write job per fold and one fewer read job per search."""
    import uuid

    staging = os.path.join(path, f"_meta_staging_{uuid.uuid4().hex[:12]}")
    df_table.write.mode("overwrite").parquet(os.path.join(staging, "df.parquet"))
    v = version
    while not fsops.rename_no_clobber(staging, _meta_dir(path, v)):
        v += 1
    return v


def _write_buckets(
    path: str, table: str, frame: DataFrame, touched: list[int], versions: dict
) -> dict[str, int]:
    """Stage new version dirs for ``touched`` buckets in ONE Spark write
    (``partitionBy`` into a transient staging dir, then metadata-only
    renames into the versioned locations — not one job per bucket).
    Buckets emptied by the fold simply get no directory (and leave the
    pointer map). Returns the updated bucket→version entries
    (stringified keys, JSON round-trip-stable)."""
    # writer-PRIVATE staging dir (random suffix): racing writers stage
    # side by side instead of clobbering one shared _staging tree
    import uuid

    staging = os.path.join(path, table, f"_staging_{uuid.uuid4().hex[:12]}")
    fsops.remove_tree(staging)
    # duplicate the partition column so the data files keep ``bucket``
    # (partitionBy lifts its column out of the files); repartition ON the
    # bucket value first so each bucket directory gets ONE file instead
    # of one per upstream task — without it a 32-task frame × 64 buckets
    # staging write fragments into ~2k tiny files and every later
    # directory-pruned read pays file-open overhead per fragment (a
    # deployment sizes N_BUCKETS so one file per bucket sits near the
    # object-store sweet spot)
    frame.withColumn("pb", F.col("bucket")).repartition(F.col("pb")).write.partitionBy(
        "pb"
    ).mode("overwrite").parquet(staging)
    allowed = {int(b) for b in touched}
    out = _claim_bucket_slots(path, table, staging, allowed, versions)
    fsops.remove_tree(staging)
    return out


def _claim_bucket_slots(
    path: str, table: str, staged_root: str, allowed: set[int], versions: dict
) -> dict[str, int]:
    """Rename every staged ``pb=<b>`` partition dir under ``staged_root``
    into its versioned bucket location (metadata-only). Shared by the
    per-table writer and the fused postings+doclen writer."""
    out = {}
    for entry in fsops.list_dir(staged_root):
        if not entry.startswith("pb="):
            continue
        b = int(entry.split("=", 1)[1])
        # a staged bucket outside the touched set means the frame and the
        # delta's bucketing drifted — corrupting an un-versioned bucket
        assert b in allowed, f"staged bucket {b} outside touched set for {table}"
        # claim the first FREE versioned slot at-or-past the hint: an
        # occupied slot (crashed prior attempt, or a racing writer's
        # staged/committed dir) is never clobbered — the losing
        # pointer's unreferenced slots are reclaimed by cleanup/vacuum
        v = int(versions.get(str(b), -1)) + 1
        while not fsops.rename_no_clobber(
            os.path.join(staged_root, entry), _bucket_dir(path, table, b, v)
        ):
            v += 1
        out[str(b)] = v
    return out


def _write_buckets_fused(
    path: str,
    postings: DataFrame,
    touched: list[int],
    ptr: dict,
    doclen: DataFrame | None = None,
) -> tuple[dict[str, int], dict[str, int]]:
    """Stage the touched buckets of BOTH per-bucket tables — postings
    and the derived doclen — in ONE Spark write (r13 verdict #5): the
    two frames union with a ``kind`` discriminator and partition by
    (kind, pb), so a fold pays one write job instead of two. The staged
    ``kind=<table>/pb=<b>`` dirs rename into exactly the same versioned
    bucket locations as before — the directory-pruned read contract is
    untouched, and each read's fixed schema prunes the other kind's
    null-filled columns at the parquet scan.

    ``postings`` must be the KEPT rows (post-eviction); ``doclen``
    (doc_id, dl, bucket) is derived from them when not supplied — a
    caller that already rolled the kept rows up per doc passes it to
    skip the second aggregation. Returns (postings entries, doclen
    entries)."""
    import uuid

    dl_null = F.lit(None).cast("long").alias("dl")
    p_part = postings.select(
        "doc_id", "token", "tf", "positions", dl_null, "bucket",
        F.lit("postings").alias("kind"),
    )
    d_part = (_doclen_of(postings) if doclen is None else doclen).select(
        "doc_id",
        F.lit(None).cast("string").alias("token"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("array<int>").alias("positions"),
        F.col("dl"),
        "bucket",
        F.lit("doclen").alias("kind"),
    )
    staging = os.path.join(path, f"_union_staging_{uuid.uuid4().hex[:12]}")
    fsops.remove_tree(staging)
    # one file per (kind, bucket) — same fragmentation reasoning as
    # _write_buckets's repartition on the bucket value
    (
        p_part.unionByName(d_part)
        .withColumn("pb", F.col("bucket"))
        .repartition(F.col("kind"), F.col("pb"))
        .write.partitionBy("kind", "pb")
        .mode("overwrite")
        .parquet(staging)
    )
    allowed = {int(b) for b in touched}
    # the per-table staging used to create these parents as a side
    # effect; the fused staging lives at the index root, so a first
    # build must create them before the renames
    os.makedirs(os.path.join(path, "postings"), exist_ok=True)
    os.makedirs(os.path.join(path, "doclen"), exist_ok=True)
    p_out = _claim_bucket_slots(
        path, "postings", os.path.join(staging, "kind=postings"), allowed,
        ptr["postings"],
    )
    d_out = _claim_bucket_slots(
        path, "doclen", os.path.join(staging, "kind=doclen"), allowed,
        ptr["doclen"],
    )
    fsops.remove_tree(staging)
    return p_out, d_out


# --- build / fold ----------------------------------------------------------


def build_bm25_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    store_positions: bool = True,
) -> int:
    """Batch bootstrap: bucketed positional postings + derived doclen,
    df, globals — staged fully, then published by one pointer swap
    (rebuild over a live index is itself crash-safe: readers keep the
    old pointer until the swap). One tokenize pass: doclen, df, and
    globals all derive from the checkpointed postings.

    ``store_positions=False`` builds a positions-OFF index: the
    postings schema is unchanged (positions all-null, so folds/reads
    never branch) but the stored bytes drop ~2×. Term search is
    identical in results AND plan (it never selects positions — the
    parquet read is column-pruned); phrase search refuses the index
    with a clear error. The mode is recorded in the pointer and every
    CDC fold inherits it."""
    from concurrent.futures import ThreadPoolExecutor

    old, tok = _read_ptr_with_token(path)
    tf = _doc_tf(docs, text_col, id_col, store_positions).localCheckpoint(eager=True)
    meta_v = old["meta"] + 1
    g = tf.agg(
        F.countDistinct("doc_id").alias("n"), F.sum("tf").alias("s")
    ).first()
    df_table = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # versions continue past the previous generation's, so staging can
    # never overwrite a directory the live pointer still references;
    # the two staged outputs are path-disjoint → concurrent jobs
    # (postings + derived doclen fused into ONE bucket write, r14)
    all_buckets = list(range(_N_BUCKETS))
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_bkts = pool.submit(_write_buckets_fused, path, tf, all_buckets, old)
        f_meta = pool.submit(_write_meta, spark, path, meta_v, df_table)
        p_entries, d_entries = f_bkts.result()
        ptr = {
            "meta": f_meta.result(),
            "postings": p_entries,
            "doclen": d_entries,
            "folds": [],
            "pos": bool(store_positions),
            "globals": {"n_docs": int(g["n"] or 0), "sum_dl": int(g["s"] or 0)},
        }
    _write_ptr(path, ptr, tok)
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

    One multi-output pass (r11 verdict #2): after the delta checkpoint
    and a single tag+touched aggregate, ONE combined frame (new
    postings ∪ touched old postings flagged evicted/kept) feeds every
    output — df counters, globals, new postings buckets, and new
    doclen buckets (doclen is Σ tf, so the old doclen dirs are never
    even read).
    """
    delta = delta.select(
        F.col(op_col).alias("__op"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias(text_col),
    ).localCheckpoint(eager=True)
    # one aggregate: replay tag digests + the touched bucket set (a pure
    # function of the delta's ids — crc32 bucketing needs no index probe)
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
        F.collect_set(_bucket(F.col("doc_id"))).alias("bs"),
    ).first()
    tag = batch_tag if batch_tag is not None else f"n{row['n']}_a{row['d1']}_b{row['d2']}"
    touched = sorted(int(b) for b in row["bs"])
    ptr, tok = _read_ptr_with_token(path)
    if tag in ptr["folds"]:
        return {"replayed": True, "tag": tag, "n_docs": int(read_globals(spark, path)["n_docs"])}

    # evict-then-place (the ANN fold's discipline): every delta id's old
    # image leaves before I/U images land, so an INSERT for an id that
    # already exists upserts instead of silently double-counting
    victims = delta.select("doc_id").distinct().withColumn("__ev", F.lit(True))
    new_docs = delta.filter(F.col("__op").isin("INSERT", "UPDATE")).select(
        "doc_id", text_col
    )
    tp = _read_table(spark, path, "postings", _POSTINGS_SCHEMA, ptr, touched)
    combined = (
        _doc_tf(new_docs, text_col, "doc_id", with_positions=ptr["pos"])
        .select("doc_id", "token", "tf", "positions", "bucket")
        .withColumn("__new", F.lit(True))
        .withColumn("__ev", F.lit(False))
        .unionByName(
            tp.select("doc_id", "token", "tf", "positions", "bucket")
            .withColumn("__new", F.lit(False))
            .join(F.broadcast(victims), "doc_id", "left")
            .withColumn("__ev", F.coalesce(F.col("__ev"), F.lit(False)))
            .select("doc_id", "token", "tf", "positions", "bucket", "__new", "__ev")
        )
        .localCheckpoint(eager=True)
    )
    # --- per-doc rollup (r14): one token→doc aggregation reused twice --
    # A doc's rows share their flags per source branch, so grouping on
    # (doc_id, bucket, flags) yields ≤2 rows per doc: its new image
    # and/or its old image. This frame IS the doclen table for the kept
    # side (dl = Σ tf), and the fold counters are a distinct-free
    # aggregate over it — replacing a 3-job countDistinct Expand over
    # token-level rows AND the doclen groupBy inside the bucket write.
    per_doc = (
        combined.groupBy("doc_id", "bucket", "__new", "__ev")
        .agg(F.sum("tf").cast("long").alias("dl"))
        .localCheckpoint(eager=True)
    )
    st = per_doc.agg(
        F.count(F.when(F.col("__ev"), 1)).alias("ev_n"),
        F.sum(F.when(F.col("__ev"), F.col("dl"))).alias("ev_s"),
        F.count(F.when(F.col("__new"), 1)).alias("nw_n"),
        F.sum(F.when(F.col("__new"), F.col("dl"))).alias("nw_s"),
    ).first()
    # df counters by UNION + one groupBy — no join: the old table's rows
    # carry their df, placed rows +1, evicted rows −1, one shuffle total
    old_df = read_df_table(spark, path)
    new_df = (
        old_df.unionByName(
            combined.filter(F.col("__new") | F.col("__ev")).select(
                "token",
                F.when(F.col("__new"), F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("df"),
            )
        )
        .groupBy("token")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
    )
    g = read_globals(spark, path)
    n_docs = int(g["n_docs"]) - int(st["ev_n"] or 0) + int(st["nw_n"] or 0)
    sum_dl = int(g["sum_dl"]) - int(st["ev_s"] or 0) + int(st["nw_s"] or 0)

    # --- stage touched buckets + meta, then publish --------------------
    # the three staged outputs share no paths and all derive from the
    # checkpointed frame, so they run as CONCURRENT Spark jobs — the
    # publish (pointer swap) still happens only after every one landed
    from concurrent.futures import ThreadPoolExecutor

    kept = combined.filter(~F.col("__ev")).select(
        "doc_id", "token", "tf", "positions", "bucket"
    )
    # kept docs carry exactly one per_doc group (new XOR old-kept), so
    # the filtered rollup IS the new doclen rows — no second groupBy
    kept_dl = per_doc.filter(~F.col("__ev")).select("doc_id", "dl", "bucket")
    meta_v = ptr["meta"] + 1
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_meta = pool.submit(_write_meta, spark, path, meta_v, new_df)
        f_bkts = pool.submit(
            _write_buckets_fused, path, kept, touched, ptr, kept_dl
        )
        meta_v = f_meta.result()  # the CLAIMED slot (≥ the hint)
        p_entries, d_entries = f_bkts.result()
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
        "pos": ptr["pos"],  # folds inherit the index's positions mode
        "globals": {"n_docs": int(n_docs), "sum_dl": int(sum_dl)},
    }
    _write_ptr(path, nxt, tok)  # the commit point (CAS on the read token)
    _cleanup(path, nxt)
    return {
        "replayed": False,
        "tag": tag,
        "touched_buckets": len(touched),
        "total_buckets": _N_BUCKETS,
        "evicted_docs": int(st["ev_n"] or 0),
        "new_docs": int(st["nw_n"] or 0),
        "n_docs": n_docs,
    }


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
    # collect_set in one full aggregate (≤ N_BUCKETS values) instead of
    # distinct().collect(): one Spark job, no exchange materialization
    hit_buckets = sorted(
        int(b) for b in tf.agg(F.collect_set("bucket")).first()[0]
    )
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


def bm25_phrase_search(
    spark: SparkSession,
    path: str,
    phrase: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k EXACT-PHRASE retrieval from the maintained index's
    positional postings. A phrase occurrence is an anchor position
    where every phrase term lands at its offset: term i (1-based) at
    position p contributes anchor p − i + 1, and an anchor covered by
    all len(phrase) DISTINCT offsets is one occurrence. Scoring is
    BM25 over the per-doc occurrence count, with df = number of docs
    containing the phrase (computed at query time from the matched
    postings — delta-scale, never corpus-scale: term-pushed postings
    read, bucket-pruned doclen read, broadcast phrase map).

    Returns (doc_id, phrase_tf, score, rnk) — the same shape as the
    registered ``text_bm25_phrase_search`` so the DuckDB oracle can
    gate a CDC-maintained index byte-for-byte.
    """
    from pyspark.sql import Window

    ptr = read_ptr(path)
    if not ptr["pos"]:
        raise ValueError(
            "phrase search needs positional postings; this index was "
            "built with store_positions=False (term search still works)"
        )
    g = read_globals(spark, path)
    n_docs, sum_dl = int(g["n_docs"]), int(g["sum_dl"])
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0
    ph = phrase_df(spark, phrase)
    post = (
        _read_table(spark, path, "postings", _POSTINGS_SCHEMA, ptr)
        .filter(F.col("token").isin(*phrase))
        .select("doc_id", "token", "positions", "bucket")
        .localCheckpoint(eager=True)  # scanned twice: bucket probe + match
    )
    # same single-job probe as bm25_search (≤ N_BUCKETS values)
    hit_buckets = sorted(
        int(b) for b in post.agg(F.collect_set("bucket")).first()[0]
    )
    occ = (
        post.join(F.broadcast(ph), post["token"] == ph["term"])
        .select("doc_id", "i", F.explode("positions").alias("pos"))
        .select("doc_id", "i", (F.col("pos") - F.col("i") + 1).alias("anchor"))
        .groupBy("doc_id", "anchor")
        .agg(F.countDistinct("i").alias("hits"))
        .filter(F.col("hits") == len(phrase))
    )
    ptf = occ.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("phrase_tf"))
    pdf = ptf.agg(F.count(F.lit(1)).alias("df"))
    dl = _read_table(spark, path, "doclen", _DOCLEN_SCHEMA, ptr, hit_buckets).select(
        "doc_id", "dl"
    )
    scored = (
        ptf.join(dl, "doc_id")
        .crossJoin(F.broadcast(pdf))
        .select(
            "doc_id",
            "phrase_tf",
            (
                ((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("phrase_tf") * (k1 + 1.0))
                / (
                    F.col("phrase_tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
                )
            ).cast("decimal(18,9)").cast("double").alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "phrase_tf", "score", "rnk")
    )
