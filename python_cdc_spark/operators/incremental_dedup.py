"""Incremental near-dup maintenance: index once, process deltas.

At 100 TB you cannot re-run corpus dedup from scratch every time a
crawl lands — the batch pipeline's gram/band tables ARE an index, so
persist them and process only the delta:

- candidate pairs = delta bands vs (index ∪ delta) bands — old↔old
  pairs are never re-examined (their connectivity already lives in the
  stored components);
- verification = exact Jaccard over gram cells, same threshold as the
  batch path;
- cluster merge = connected components over the CONTRACTED graph: old
  clusters participate as their canonical id (one super-node each), so
  the iterative closure touches only components the delta actually
  connects to — work scales with the delta, not the corpus.

``test_incremental_dedup_matches_batch`` pins the contract: any split
of the corpus into base + deltas yields byte-identical components to
the one-shot batch run.

Storage layout under ``path`` (all parquet):
  base_v<N>/{cells,bands,sizes}/
                              — versioned base tables (bootstrap or
                                compaction output)
  _base_ptr                   — JSON {version, includes}: the current
                                base and the delta tags it absorbed
  deltas/<tag>/{cells,bands,sizes}/ + _COMMITTED
                              — one subdirectory per folded delta,
                                committed all-or-nothing by the marker
  deltas/g<seq>-<tag>/... + evicted/
                              — CDC folds (``cdc_dedup_index_update``):
                                generation-numbered, plus the id list
                                whose earlier-generation images the
                                delta evicts (UPDATE/DELETE)
  components_v<N>/            — versioned cluster tables
  _components_ptr             — points at the current version

An index read = current base ∪ committed deltas not yet absorbed into
the base (the ``includes`` list) — so compaction is crash-safe too: the
new base and the exclusion of the deltas it merged become visible in
ONE ``os.replace`` of ``_base_ptr``; deleting the absorbed delta
directories afterward is pure cleanup.

Crash safety (ADVICE r4): a fold is idempotent by construction. On
entry it deletes every uncommitted ``deltas/*`` directory (a crash
mid-write leaves no ``_COMMITTED``) and the current tag's directory
even if committed (a crash after commit but before the component swap
replays the fold; re-deriving the same tag from the same delta rows
makes the rewrite byte-equivalent, and re-merging already-merged pairs
is a fixpoint of the contracted closure — both endpoints map to the
same canonical, so the merge graph is empty). The component swap never
deletes the live version: it writes ``components_v<N+1>``, atomically
repoints ``_components_ptr`` via ``os.replace``, then prunes versions
older than N — a concurrent reader of version N keeps a complete
directory.

Single-writer assumption, and ``path`` must be a LOCAL filesystem path:
the ``_COMMITTED`` / ``_components_ptr`` markers use ``os`` primitives
while the parquet data goes through Spark's Hadoop FS — an object-store
URI would write data remotely but markers locally, silently voiding the
fold-once guarantee (same constraint as ``streaming/state_store.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark import fsops
from python_cdc_spark.operators.components import connected_components
from python_cdc_spark.operators.dedup import _gram_cells, minhash_signatures

_N, _K, _BANDS, _THRESHOLD = 3, 8, 4, 0.5
_TABLES = ("cells", "bands", "sizes")
# Fixed on-disk schemas (ids are longs by layout contract — the
# components table has always been "v long"; ``_delta_tables`` casts).
# Passing them to every read skips the per-directory parquet
# footer-inference job Spark otherwise runs at each spark.read.parquet
# call — a CDC fold reads 3 tables × (base + deltas) + evicted + the
# components table, ~10 schema-inference jobs of pure scheduler floor
# per fold before this (r13 measurement).
_TABLE_SCHEMAS = {
    "cells": "id long, gram string",
    "bands": "id long, band_id int, band_key string",
    "sizes": "id long, set_size long",
}
_EVICTED_SCHEMA = "id long"
_COMPONENTS_SCHEMA = "v long, component long"
# CDC fold → full-recompute crossover: past this affected-membership
# fraction the members-restricted subgraph (three corpus-scale
# semi-joins + composition) costs more than one unrestricted candidate
# pass over the stored post-change tables. Measured in
# BENCH_DEDUP_CDC.json's delta-width sweep (the r10 verdict #6 receipt).
_AFFECTED_REBUILD_FRACTION = 0.35


def _band_stack(sigs: DataFrame, k: int = _K, bands: int = _BANDS) -> DataFrame:
    """(id, band_id, band_key) — the banded LSH index rows."""
    r = k // bands
    band_keys = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("id", *band_keys)
    return banded.select(
        "id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(b) for b in range(bands)]),
                F.array(*[F.col(f"band_{b}") for b in range(bands)]),
            )
        ).alias("band_id", "band_key"),
    )


def _verify_pairs(
    cand: DataFrame, cells: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard disposal of candidate (id_a, id_b) pairs."""
    ga = cells.select(F.col("id").alias("id_a"), "gram")
    gb = cells.select(F.col("id").alias("gb_id"), F.col("gram").alias("gram_b"))
    shared = (
        cand.join(ga, "id_a")
        .join(
            gb,
            (F.col("id_b") == F.col("gb_id")) & (F.col("gram") == F.col("gram_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    jac = F.col("shared").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("shared")
    ).cast("double")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b")
    )


def _delta_tables(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    # long ids by layout contract (components are "v long" and the CDC
    # fold casts); enforcing it here lets every read use the fixed
    # ``_TABLE_SCHEMAS`` instead of paying schema inference per dir
    docs = docs.select(F.col(id_col).cast("long").alias(id_col), text_col)
    cells = _gram_cells(docs, text_col, id_col, _N).localCheckpoint(eager=False)
    sigs = minhash_signatures(
        docs, text_col, id_col, n=_N, k=_K, one_permutation=True, cells=cells
    )
    bands = _band_stack(sigs)
    sizes = cells.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    return cells, bands, sizes


# --- index layout helpers -------------------------------------------------


def _deltas_root(path: str) -> str:
    return os.path.join(path, "deltas")


def _base_pointer(path: str) -> str:
    return os.path.join(path, "_base_ptr")


def _read_base_ptr(path: str) -> dict:
    """{"version": N, "includes": [tags]} — or the legacy flat layout
    (base tables directly under ``path``, nothing absorbed)."""
    return _read_base_ptr_with_token(path)[0]


def _read_base_ptr_with_token(path: str) -> tuple[dict, object]:
    """Pointer plus identity token for a conditional ``_write_base_ptr``
    (optimistic concurrency at the swap; fsops.cas_publish)."""
    return fsops.read_json_with_token(
        _base_pointer(path), {"version": -1, "includes": []}
    )


def _write_base_ptr(
    path: str,
    version: int,
    includes: list[str],
    expected_token: object,
    n_docs: int | None = None,
) -> None:
    """Commit point: conditional on the pointer not having moved since
    this writer's read — racing rebuild/compact/prune writers resolve
    to one winner, the loser raising ConcurrentWriterError. ``n_docs``
    (when known) records the base corpus size so folds can derive the
    reroute-check denominator from metadata instead of an O(corpus)
    scan per fold (r13; see ``_corpus_count``)."""
    ptr = {"version": version, "includes": sorted(includes)}
    if n_docs is not None:
        ptr["n_docs"] = int(n_docs)
    fsops.cas_publish(_base_pointer(path), ptr, expected_token)


def _claim_base(path: str, hint: int, write_tables) -> tuple[str, int]:
    """Stage a new base into a writer-private dir (``write_tables`` is
    called with the staging path), then claim the first free
    ``base_v*`` slot at-or-past ``hint`` via non-clobbering rename.
    Returns (claimed dir, claimed version) — the pointer must record
    the claimed version, not the hint. Racing writers each claim a
    distinct slot; the losing pointer's slot is vacuum fodder."""
    import uuid

    stage = os.path.join(path, f"_base_staging_{uuid.uuid4().hex[:12]}")
    write_tables(stage)
    v = hint
    while not fsops.rename_no_clobber(stage, os.path.join(path, f"base_v{v}")):
        v += 1
    return os.path.join(path, f"base_v{v}"), v


def _base_dir(path: str, ptr: dict) -> str:
    if ptr["version"] < 0:
        return path  # legacy flat layout: cells/ bands/ sizes/ at top level
    return os.path.join(path, f"base_v{ptr['version']}")


def _committed_delta_dirs(path: str, ptr: dict | None = None) -> list[str]:
    """Committed delta dirs NOT yet absorbed into the current base."""
    ptr = ptr if ptr is not None else _read_base_ptr(path)
    absorbed = set(ptr["includes"])
    root = _deltas_root(path)
    return sorted(
        os.path.join(root, d)
        for d in fsops.list_dir(root)
        if d not in absorbed
        and fsops.is_file(os.path.join(root, d, "_COMMITTED"))
    )


def _prune_uncommitted_deltas(path: str) -> None:
    """Delete partial delta directories left by a crashed fold (no
    ``_COMMITTED`` marker), and absorbed ones a crashed compaction did
    not get to clean up. Single-writer: only the folding process may
    call this."""
    root = _deltas_root(path)
    if not fsops.is_dir(root):
        return
    ptr, tok = _read_base_ptr_with_token(path)
    absorbed = set(ptr["includes"])
    for d in fsops.list_dir(root):
        full = os.path.join(root, d)
        if d in absorbed or not fsops.is_file(os.path.join(full, "_COMMITTED")):
            fsops.remove_tree(full)
    # drop includes entries whose directories are now gone, so a future
    # fold that legitimately reuses the tag isn't silently masked
    live = [t for t in ptr["includes"] if fsops.is_dir(os.path.join(root, t))]
    if ptr["version"] >= 0 and live != sorted(ptr["includes"]):
        _write_base_ptr(path, ptr["version"], live, tok, n_docs=ptr.get("n_docs"))


def _cdc_gen(dirpath: str) -> int:
    """Generation of a delta directory. CDC folds name their dirs
    ``g<seq>-<tag>`` (monotone seq); insert-only folds use the bare
    content tag and read as generation 0 (they never evict, and the
    documented contract is CDC-API-exclusive once the first CDC fold
    lands, so ordering between them never matters)."""
    base = os.path.basename(dirpath)
    if base.startswith("g") and "-" in base:
        head = base[1:].split("-", 1)[0]
        if head.isdigit():
            return int(head)
    return 0


def read_index_tables(
    spark: SparkSession, path: str, names: tuple[str, ...] = _TABLES
) -> dict[str, DataFrame]:
    """Several of cells/bands/sizes from ONE pointer read: each table is
    the current base unioned with every committed, not-yet-absorbed
    delta directory (partial folds are invisible), minus rows a LATER
    generation evicted.

    Eviction is generation-aware so an UPDATE replaces its old image
    without resurrecting it: a CDC delta's ``evicted`` id list applies
    to every strictly-earlier generation (base = 0), never to the
    evicting delta's own re-inserted rows or later ones. Per-delta
    eviction lists are batch-scale, so the anti-joins broadcast.

    The evicted-id set at a generation boundary depends only on the set
    of strictly-later delta dirs — not on which table is being read —
    so one distinct frame per boundary, lazily checkpointed, is shared
    by every table in ``names``: the first consumer materializes the
    scan+distinct once, later consumers only re-broadcast the
    checkpointed partitions (r13: a fold read all three tables through
    separate calls and paid the evicted scan + distinct exchange +
    broadcast build three times per boundary)."""
    ptr = _read_base_ptr(path)
    deltas = _committed_delta_dirs(path, ptr)
    evs = [
        (_cdc_gen(d), os.path.join(d, "evicted"))
        for d in deltas
        if os.path.isdir(os.path.join(d, "evicted"))
    ]
    ev_frames: dict[tuple[str, ...], DataFrame] = {}

    def _ev_for(gen: int) -> DataFrame | None:
        later = tuple(e for g, e in evs if g > gen)
        if not later:
            return None
        if later not in ev_frames:
            ev_frames[later] = (
                spark.read.schema(_EVICTED_SCHEMA)
                .parquet(*later)
                .select("id")
                .distinct()
                .localCheckpoint(eager=False)
            )
        return ev_frames[later]

    out: dict[str, DataFrame] = {}
    for name in names:
        dirs = [(0, os.path.join(_base_dir(path, ptr), name))] + [
            (_cdc_gen(d), os.path.join(d, name)) for d in deltas
        ]
        schema = _TABLE_SCHEMAS[name]  # fixed layout: no inference job per dir
        if not evs:
            out[name] = spark.read.schema(schema).parquet(*[p for _, p in dirs])
            continue
        acc = None
        for gen, p in dirs:
            df = spark.read.schema(schema).parquet(p)
            ev = _ev_for(gen)
            if ev is not None:
                df = df.join(F.broadcast(ev), "id", "left_anti")
            acc = df if acc is None else acc.unionByName(df)
        out[name] = acc
    return out


def read_index_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    """One index table — see ``read_index_tables`` (which callers that
    need several tables should use, to share the per-boundary evicted
    frames and the pointer read)."""
    return read_index_tables(spark, path, (name,))[name]


def _components_pointer(path: str) -> str:
    return os.path.join(path, "_components_ptr")


def _current_components_dir(path: str) -> str:
    got = fsops.read_json(_components_pointer(path))
    try:
        return os.path.join(path, f"components_v{int(got)}")
    except (TypeError, ValueError):
        # legacy layout (pre-versioning) fallback
        return os.path.join(path, "components")


def read_components(spark: SparkSession, path: str) -> DataFrame:
    """Current (v, component) clusters — exact as of the last fold."""
    return spark.read.schema(_COMPONENTS_SCHEMA).parquet(
        _current_components_dir(path)
    )


def _swap_components(path: str, new_comp: DataFrame) -> None:
    """Publish a new components version without ever leaving the index
    table-less: write v<N+1>, conditionally repoint (CAS on the
    pointer read — a racing writer loses cleanly), prune versions < N
    (the immediately-previous version survives one generation so a
    racing reader of the old pointer still finds a complete dir)."""
    import uuid

    got, tok = fsops.read_json_with_token(_components_pointer(path))
    try:
        cur = int(got) if got is not None else -1
    except (TypeError, ValueError):
        cur = -1
    # stage-and-claim, then CAS the pointer at the claimed version
    stage = os.path.join(path, f"_components_staging_{uuid.uuid4().hex[:12]}")
    new_comp.write.mode("overwrite").parquet(stage)
    nxt = cur + 1
    while not fsops.rename_no_clobber(stage, os.path.join(path, f"components_v{nxt}")):
        nxt += 1
    fsops.cas_publish(_components_pointer(path), nxt, tok)
    for d in fsops.list_dir(path):
        if d.startswith("components_v"):
            try:
                v = int(d[len("components_v"):])
            except ValueError:
                continue
            if v < cur:
                fsops.remove_tree(os.path.join(path, d))
    legacy = os.path.join(path, "components")
    if cur == -1 and fsops.is_dir(legacy):
        fsops.remove_tree(legacy)


def _delta_fingerprint(delta_docs: DataFrame, id_col: str) -> str:
    """Deterministic content tag for a delta: count + two commutative
    60-bit id digests (order-independent sums, so the tag is stable
    across partitionings and replays of the same delta)."""
    row = delta_docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 15), 16, 10).cast(
                "decimal(38,0)"
            )
        ).alias("d1"),
        F.sum(
            F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 17, 15), 16, 10).cast(
                "decimal(38,0)"
            )
        ).alias("d2"),
    ).first()
    return f"n{row['n']}_a{row['d1']}_b{row['d2']}"


def build_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Batch bootstrap: gram/band/size base tables + initial components.
    Rebuilding over an existing index restarts it: the new base pointer
    absorbs nothing, and stale delta directories are cleared."""
    ptr, tok = _read_base_ptr_with_token(path)
    nxt = ptr["version"] + 1
    # stage-and-claim (fsops.rename_no_clobber): build into a
    # writer-private dir, then claim the first free base_v slot — a
    # racing writer's staged/committed base is never clobbered; the
    # CAS'd pointer publish below then picks exactly one winner
    base, nxt = _claim_base(
        path,
        nxt,
        lambda stage: [
            t.write.mode("overwrite").parquet(os.path.join(stage, sub))
            for t, sub in zip(_delta_tables(docs, text_col, id_col), _TABLES)
        ],
    )
    # exact corpus size recorded in the pointer: folds derive their
    # reroute denominator from metadata instead of scanning sizes
    n_docs = (
        spark.read.schema(_TABLE_SCHEMAS["sizes"])
        .parquet(os.path.join(base, "sizes"))
        .count()
    )
    _write_base_ptr(path, nxt, [], tok, n_docs=n_docs)
    fsops.remove_tree(_deltas_root(path))  # fresh bootstrap
    if ptr["version"] >= 0:
        fsops.remove_tree(_base_dir(path, ptr))
    b = spark.read.schema(_TABLE_SCHEMAS["bands"]).parquet(os.path.join(base, "bands"))
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    cells_r = spark.read.schema(_TABLE_SCHEMAS["cells"]).parquet(
        os.path.join(base, "cells")
    )
    sizes_r = spark.read.schema(_TABLE_SCHEMAS["sizes"]).parquet(
        os.path.join(base, "sizes")
    )
    pairs = _verify_pairs(cand, cells_r, sizes_r, _THRESHOLD)
    comp = connected_components(pairs, "id_a", "id_b")
    _swap_components(path, comp)


def incremental_dedup_update(
    spark: SparkSession,
    path: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_tag: str | None = None,
) -> DataFrame:
    """Fold a delta into the index; returns the UPDATED (v, component)
    mapping (non-singletons only, canonical = cluster-min id — the same
    shape ``connected_components`` returns for a batch run).

    The only corpus-wide work is two index reads joined ON KEY (band
    key, gram); everything iterative runs on the contracted graph.

    ``batch_tag`` names the delta's subdirectory (streaming passes the
    micro-batch id); when omitted the tag is derived from the delta's
    content fingerprint, so replaying the same delta after a crash
    reuses — and first deletes — the same directory instead of
    appending a duplicate.
    """
    tag = batch_tag if batch_tag is not None else _delta_fingerprint(delta_docs, id_col)
    delta_dir = os.path.join(_deltas_root(path), str(tag))
    # CDC-API-exclusive contract, ENFORCED (r10 ADVICE): insert-only
    # delta dirs read as generation 0, so a fold landed here AFTER any
    # CDC fold would have its rows evicted by every existing generation's
    # evicted list — silently dropped inserts. Route through the CDC API.
    root = _deltas_root(path)
    if any(_cdc_gen(d) > 0 for d in fsops.list_dir(root)):
        raise ValueError(
            "index has taken CDC folds (generation directories exist); "
            "use cdc_dedup_index_update for all further folds"
        )
    # idempotence: clear partials from any crashed fold, and this tag's
    # directory even if committed (crash after commit, before swap /
    # marker — recomputation is a fixpoint, see module docstring)
    _prune_uncommitted_deltas(path)
    fsops.remove_tree(delta_dir)

    d_cells, d_bands, d_sizes = _delta_tables(delta_docs, text_col, id_col)
    d_cells = d_cells.localCheckpoint(eager=False)
    d_bands = d_bands.localCheckpoint(eager=False)
    old_tabs = read_index_tables(spark, path)
    old_cells, old_bands, old_sizes = (
        old_tabs["cells"], old_tabs["bands"], old_tabs["sizes"],
    )
    old_comp = read_components(spark, path)

    all_bands = old_bands.unionByName(d_bands)
    # candidates touching the delta: delta side x full band index
    cand = (
        d_bands.alias("x")
        .join(
            all_bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") != F.col("y.id")),
        )
        .select(
            F.least(F.col("x.id"), F.col("y.id")).alias("id_a"),
            F.greatest(F.col("x.id"), F.col("y.id")).alias("id_b"),
        )
        .distinct()
    )
    all_cells = old_cells.unionByName(d_cells)
    all_sizes = old_sizes.unionByName(d_sizes)
    new_pairs = _verify_pairs(cand, all_cells, all_sizes, _THRESHOLD)

    # contract: old ids participate as their canonical
    def canon(df: DataFrame, col: str) -> DataFrame:
        m = old_comp.select(
            F.col("v").alias(col), F.col("component").alias(f"__c_{col}")
        )
        return df.join(m, col, "left").withColumn(
            col, F.coalesce(F.col(f"__c_{col}"), F.col(col))
        ).drop(f"__c_{col}")

    contracted = canon(canon(new_pairs, "id_a"), "id_b").filter(
        F.col("id_a") != F.col("id_b")
    )
    merged = connected_components(contracted, "id_a", "id_b")
    # compose: every doc's old canonical re-maps through the merge
    m = merged.select(F.col("v").alias("component"), F.col("component").alias("__new"))
    composed_old = (
        old_comp.join(m, "component", "left")
        .select("v", F.coalesce(F.col("__new"), F.col("component")).alias("component"))
    )
    # vertices NEW to the component table: delta docs in a pair, plus
    # old singletons a delta doc just connected to (they were never in
    # old_comp — ``canon`` left them uncontracted). Root self-rows stay,
    # matching the batch ``connected_components`` output shape.
    new_members = merged.join(old_comp.select(F.col("v")), "v", "left_anti")
    new_comp = composed_old.unionByName(new_members.select("v", "component"))
    new_comp = new_comp.localCheckpoint(eager=True)  # sever lineage before swap

    # fold the delta in all-or-nothing: write the three tables into the
    # tag's subdirectory, then the _COMMITTED marker (atomic create)
    for name, df in (("cells", d_cells), ("bands", d_bands), ("sizes", d_sizes)):
        df.write.mode("overwrite").parquet(os.path.join(delta_dir, name))
    fsops.write_marker(os.path.join(delta_dir, "_COMMITTED"), str(tag))
    _swap_components(path, new_comp)
    return new_comp


def _cdc_delta_fingerprint(
    delta: DataFrame, id_col: str, op_col: str, text_col: str
) -> str:
    """Content tag for a CDC delta: like ``_delta_fingerprint`` but the
    digest covers (op, id, TEXT) — op so an INSERT-then-DELETE of the
    same ids in two later folds cannot collide, and text (r10 ADVICE)
    so a second UPDATE wave over the same id multiset with different
    content cannot alias an earlier fold's tag and rewrite its
    generation (which would let later generations' evicted lists
    suppress the newest images)."""
    return _cdc_delta_fingerprint_and_width(delta, id_col, op_col, text_col)[0]


def _corpus_count(spark: SparkSession, path: str, ptr: dict) -> int | None:
    """Pointer-tracked corpus-size ESTIMATE for the reroute-fraction
    checks: base ``n_docs`` (recorded at build/compact) adjusted by
    each committed CDC delta's (placed − evicted) id counts from its
    ``_counts.json`` sidecar. Metadata-only — the exact
    ``post_sizes.count()`` it replaces was an O(corpus) scan inside
    the O(delta) fold path (r13). Returns None (caller falls back to
    the exact count) for legacy indexes without ``n_docs`` or with
    insert-only delta dirs that predate the sidecar.

    Estimate semantics, deliberately: a DELETE of an absent id or an
    INSERT of an existing id drifts the estimate by one; both reroute
    tiers are COST-PLACEMENT decisions between two exact plans
    (module docstring), so drift can only shift which exact plan runs.
    Compaction re-counts exactly and resets the base."""
    base_n = ptr.get("n_docs")
    if base_n is None:
        return None
    n = int(base_n)
    for d in _committed_delta_dirs(path, ptr):
        c = fsops.read_json(os.path.join(d, "_counts.json"))
        if c is None:
            return None
        n += int(c.get("new", 0)) - int(c.get("evicted", 0))
    return max(n, 0)


def _cdc_delta_fingerprint_and_width(
    delta: DataFrame, id_col: str, op_col: str, text_col: str
) -> tuple[str, int, int, int]:
    """``(tag, distinct id count, evicted id count, placed id count)``
    from ONE aggregate action — the fold needs all four (the tag names
    the delta dir; the width feeds the reroute-fraction check; the
    evicted/placed counts maintain the pointer-tracked corpus size),
    and fusing them saves whole Spark jobs per fold (r13 pass)."""
    key = F.concat_ws(
        ":",
        F.col(op_col),
        F.col(id_col).cast("string"),
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
        # width = |evicted ∪ new ids| exactly: UPDATE/DELETE ids evict,
        # INSERT/UPDATE ids place — rows with any other op count for
        # the tag (content digest) but not for the reroute width
        F.countDistinct(
            F.when(
                F.col(op_col).isin("INSERT", "UPDATE", "DELETE"), F.col(id_col)
            )
        ).alias("w"),
        F.countDistinct(
            F.when(F.col(op_col).isin("UPDATE", "DELETE"), F.col(id_col))
        ).alias("ev"),
        F.countDistinct(
            F.when(F.col(op_col).isin("INSERT", "UPDATE"), F.col(id_col))
        ).alias("nw"),
    ).first()
    return (
        f"n{row['n']}_a{row['d1']}_b{row['d2']}",
        int(row["w"] or 0),
        int(row["ev"] or 0),
        int(row["nw"] or 0),
    )


def cdc_dedup_index_update(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    op_col: str = "operation",
    batch_tag: str | None = None,
) -> DataFrame:
    """Fold an I/U/D CDC delta into the dedup index — the near-dup
    analog of the CDC-maintained rollup and ANN index: the index (and
    its exact cluster table) tracks a replicated document corpus
    through inserts, updates, and deletes in O(delta + affected
    clusters), never O(corpus).

    ``delta`` carries (``op_col`` ∈ INSERT/UPDATE/DELETE, ``id_col``,
    ``text_col`` — the NEW text for INSERT/UPDATE, ignored for DELETE).

    Mechanics:

    - **Index tables**: UPDATE/DELETE ids go to the delta's ``evicted``
      list (generation-aware reads drop the old images); INSERT/UPDATE
      new images get fresh gram/band/size rows. One delta directory,
      committed all-or-nothing by the ``_COMMITTED`` marker — identical
      crash discipline to the insert-only fold.
    - **Clusters, exactly**: deletions can SPLIT a component and
      insertions can MERGE two, so contracted-graph folding is not
      enough. Instead: the affected component set = components owning
      any evicted id ∪ components of any band-collision partner of a
      new image. Their members (minus evicted, plus new/partner docs)
      form a subgraph whose candidate pairs re-derive from the stored
      post-change bands and verify against the stored post-change
      cells — O(affected members), with every verified old↔old edge
      inside one component by CC's definition, so no cross-boundary
      edge can be missed. Untouched components carry over unchanged.

    Returns the updated (v, component) table (non-singletons, component
    = cluster-min id — same contract as the batch operator). Once an
    index takes CDC folds, keep using this API (the insert-only fold
    does not know about evictions ordered after its rows)."""
    delta = delta.select(
        F.col(op_col).alias("__op"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col).alias(text_col),
    ).localCheckpoint(eager=False)
    # one aggregate action yields the content tag, the delta's
    # distinct-id width (reroute check input), and the evicted/placed
    # id counts (pointer-tracked corpus-size maintenance)
    tag, n_delta_ids, n_ev_ids, n_new_ids = _cdc_delta_fingerprint_and_width(
        delta, id_col, "__op", text_col
    )
    if batch_tag is not None:
        tag = batch_tag
    _prune_uncommitted_deltas(path)
    root = _deltas_root(path)
    seq = 1
    for d in fsops.list_dir(root):
        g = _cdc_gen(d)
        if d.endswith(f"-{tag}"):
            seq = g  # replay: reuse the crashed fold's generation
            fsops.remove_tree(os.path.join(root, d))
            break
        seq = max(seq, g + 1)
    delta_dir = os.path.join(root, f"g{seq:06d}-{tag}")

    # lazy checkpoint: the parquet write below materializes it
    evicted = (
        delta.filter(F.col("__op").isin("UPDATE", "DELETE"))
        .select(F.col(id_col).alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    new_docs = delta.filter(F.col("__op").isin("INSERT", "UPDATE")).select(
        id_col, text_col
    )
    d_cells, d_bands, d_sizes = _delta_tables(new_docs, text_col, id_col)
    d_bands = d_bands.localCheckpoint(eager=False)
    # the four delta dirs are path-disjoint plans over a 1-delta-wide
    # checkpointed frame — submit them as CONCURRENT jobs (guide §2.6:
    # overlap independent jobs) instead of paying four job floors in
    # sequence; the _COMMITTED marker still lands only after all four
    from concurrent.futures import ThreadPoolExecutor

    writes = [
        ("cells", d_cells),
        ("bands", d_bands),
        ("sizes", d_sizes),
        ("evicted", evicted),
    ]
    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        list(
            pool.map(
                lambda nd: nd[1]
                .write.mode("overwrite")
                .parquet(os.path.join(delta_dir, nd[0])),
                writes,
            )
        )
    # corpus-size sidecar (metadata: feeds _corpus_count) rides in the
    # delta dir, before the marker so a committed delta always has it
    fsops.publish_json(
        os.path.join(delta_dir, "_counts.json"),
        {"new": n_new_ids, "evicted": n_ev_ids},
    )
    fsops.write_marker(os.path.join(delta_dir, "_COMMITTED"), str(tag))

    # post-change index: includes this delta, excludes evicted images
    # (one shared read-set: the evicted distinct frames are built once
    # per generation boundary, not once per table)
    post_tabs = read_index_tables(spark, path)
    post_cells, post_bands, post_sizes = (
        post_tabs["cells"], post_tabs["bands"], post_tabs["sizes"],
    )
    old_comp = read_components(spark, path).localCheckpoint(eager=False)

    new_ids = new_docs.select(F.col(id_col).alias("id")).distinct()
    # Wide-delta reroute, FIRST TIER (r10 verdict #6): when the delta's
    # own ids already exceed the crossover fraction of the corpus, skip
    # the partner scan (itself a corpus-scale band join) and take one
    # unrestricted candidate pass over the stored post-change tables —
    # the rebuild plan, reading the just-folded index. Exact either way.
    # The denominator comes from pointer metadata when available
    # (_corpus_count) — the exact count was an O(corpus) scan inside
    # the O(delta) path; legacy indexes fall back to it.
    ptr_now = _read_base_ptr(path)
    n_corpus = _corpus_count(spark, path, ptr_now)
    if n_corpus is None:
        n_corpus = post_sizes.count()
    if n_corpus and n_delta_ids / n_corpus > _AFFECTED_REBUILD_FRACTION:
        x, y = post_bands.alias("x"), post_bands.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        pairs = _verify_pairs(cand, post_cells, post_sizes, _THRESHOLD)
        new_comp = connected_components(pairs, "id_a", "id_b").localCheckpoint(
            eager=True
        )
        _swap_components(path, new_comp)
        return new_comp
    # partners: every doc whose band collides with a new image's band
    partners = (
        d_bands.alias("x")
        .join(
            post_bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") != F.col("y.id")),
        )
        .select(F.col("y.id").alias("id"))
        .distinct()
    )
    aff_seed = evicted.unionByName(partners).unionByName(new_ids).distinct()
    # lazy checkpoints: the members count() below (and the final
    # new_comp materialization) force them — no dedicated jobs
    aff_comp_ids = (
        old_comp.join(aff_seed.withColumnRenamed("id", "v"), "v", "left_semi")
        .select("component")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # membership: affected components' old members and partner
    # singletons, minus every evicted OLD image — then the new images
    # re-join (an UPDATE's id is in both lists: its old image leaves,
    # its new image participates)
    members = (
        old_comp.join(aff_comp_ids, "component", "left_semi")
        .select(F.col("v").alias("id"))
        .unionByName(partners)
        .join(evicted, "id", "left_anti")
        .unionByName(new_ids)
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Wide-delta reroute, SECOND TIER (the rollup catalog's
    # measured-faster discipline): a NARROW delta can still seed a wide
    # affected set through band collisions — when the membership passes
    # the crossover, the members-restricted subgraph costs corpus-scale
    # semi-joins PLUS bookkeeping, so take the unrestricted pass.
    # BENCH_DEDUP_CDC's delta-width sweep measures both tiers; both
    # plans are exact, so the reroute changes cost placement, never
    # results.
    n_members = members.count()
    if n_corpus and n_members / n_corpus > _AFFECTED_REBUILD_FRACTION:
        x, y = post_bands.alias("x"), post_bands.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        pairs = _verify_pairs(cand, post_cells, post_sizes, _THRESHOLD)
        new_comp = connected_components(pairs, "id_a", "id_b").localCheckpoint(
            eager=True
        )
        _swap_components(path, new_comp)
        return new_comp
    mb = post_bands.join(members, "id", "left_semi")
    cand = (
        mb.alias("x")
        .join(
            mb.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    pairs = _verify_pairs(
        cand,
        post_cells.join(members, "id", "left_semi"),
        post_sizes.join(members, "id", "left_semi"),
        _THRESHOLD,
    )
    sub_comp = connected_components(pairs, "id_a", "id_b")
    new_comp = (
        old_comp.join(aff_comp_ids, "component", "left_anti")
        .select("v", "component")  # the anti-join key moved to the front
        .unionByName(sub_comp)
        .localCheckpoint(eager=True)
    )
    _swap_components(path, new_comp)
    return new_comp


def compact_dedup_index(spark: SparkSession, path: str) -> int:
    """Merge committed delta directories into a new base version, then
    repoint ``_base_ptr`` atomically — bounds the file-listing cost of
    a long fold history. Returns the number of deltas compacted.

    Crash-safe: until the single ``os.replace`` of the pointer, reads
    keep serving old base + deltas; after it, the new base whose
    ``includes`` list excludes exactly those deltas. Deleting the
    absorbed directories afterward is cleanup (retried by the next
    fold's prune). Run between folds; a racing writer loses at the
    CAS'd pointer publish with its claimed base slot left for vacuum."""
    ptr, tok = _read_base_ptr_with_token(path)
    deltas = _committed_delta_dirs(path, ptr)
    if not deltas:
        return 0
    tabs = read_index_tables(spark, path)  # shared evicted frames
    newbase, nxt = _claim_base(
        path,
        ptr["version"] + 1,
        lambda stage: [
            tabs[name].write.mode("overwrite").parquet(os.path.join(stage, name))
            for name in _TABLES
        ],
    )
    absorbed = ptr["includes"] + [os.path.basename(d) for d in deltas]
    # compaction re-counts the corpus EXACTLY (it just rewrote it),
    # resetting any drift the per-delta estimates accumulated
    n_docs = (
        spark.read.schema(_TABLE_SCHEMAS["sizes"])
        .parquet(os.path.join(newbase, "sizes"))
        .count()
    )
    _write_base_ptr(path, nxt, absorbed, tok, n_docs=n_docs)
    for d in deltas:
        fsops.remove_tree(d)
    if ptr["version"] >= 0:
        fsops.remove_tree(_base_dir(path, ptr))
    return len(deltas)
