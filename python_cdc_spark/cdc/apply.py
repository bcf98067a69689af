"""Apply-changes: materialize current state from a CDC event feed (E18).

This is the engine's flagship custom operator — the capability the whole
reference exists to enable but never implements (its sink just
pretty-prints events, ``/root/reference/cdc_consumer.py:58-68``).

Semantics (matching pgoutput behavior as decoded by
``/root/reference/utils/pg_output_parser.py``):

- Events are ordered per key by ``lsn`` (commit order; the reference
  tracks it as ``msg.data_start``, ``postgre_cdc_consumer.py:99``).
- DELETE removes the row; a later INSERT recreates it from scratch.
- INSERT/UPDATE set the columns present in ``new_values``; a value equal
  to the ``[unchanged]`` TOAST sentinel (``pg_output_parser.py:112-113``)
  leaves the previous value in place.
- UPDATE/DELETE may carry key-only old images (replica identity ``K``,
  ``pg_output_parser.py:175``) — apply therefore keys on the explicit
  ``key`` column, never on the full old image.

Scale design: pure DataFrame composition — three hash shuffles, all on
the row key (or key+column), no Python UDFs, no collect. Per-column
argmax (``max_by`` over lsn) instead of per-key ``collect_list`` keeps
hot keys from concentrating whole histories on one task: the explode
spreads a key's events across its columns, and AQE skew-join handles the
rest. At 100 TB the feed shuffles once on key for the delete-boundary
join and once on (key, column) for the argmax.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_cdc_spark.schemas import OP_DELETE, UNCHANGED_SENTINEL


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str = "lsn"
) -> DataFrame:
    """Latest event per key by ``order_col`` (window argmax, E9/E18
    building block). Deterministic for unique ``order_col``."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _delete_boundary(events: DataFrame, key_col: str) -> DataFrame:
    """Per key: the lsn of the last DELETE (row lifetimes restart after
    it), or -1 if never deleted — plus the key's FIRST event lsn (the
    state-merge fast-path guard, free in the same aggregate)."""
    return (
        events.groupBy(key_col)
        .agg(
            F.coalesce(
                F.max(F.when(F.col("operation") == OP_DELETE, F.col("lsn"))),
                F.lit(-1).cast("long"),
            ).alias("__last_delete_lsn"),
            F.min("lsn").alias("__first_lsn"),
        )
    )


def expand_truncates(events: DataFrame, key_col: str) -> DataFrame:
    """Honor TRUNCATE events (pgoutput ``T`` frames decode to one
    keyless event per relation): a truncate at LSN T clears the whole
    relation, i.e. acts as a DELETE at T for EVERY key of that table.
    Expanding it into those per-key deletes (keys drawn from the feed
    itself, which in the streaming path includes the prior state
    re-encoded as events) lets the ordinary delete-boundary fold do the
    rest — including tombstones at T, so a late event below the
    boundary can never resurrect a truncated row across batches.

    Cost shape: the boundary table is O(tables) and broadcast; the key
    enumeration reuses the feed's own key set (grouped per table when
    ``schema``/``table`` columns are present, one global boundary
    otherwise). With no truncate in the feed the broadcast side is
    empty and AQE prunes the join to nothing."""
    is_t = F.col("operation") == "TRUNCATE"
    group_cols = [c for c in ("schema", "table") if c in events.columns]
    rest = events.filter(~is_t)
    t = events.filter(is_t)
    if group_cols:
        bnd = t.groupBy(*group_cols).agg(F.max("lsn").alias("__trunc_lsn"))
        keyed = (
            rest.select(*group_cols, key_col)
            .distinct()
            .join(F.broadcast(bnd), group_cols)
        )
    else:
        bnd = t.agg(F.max("lsn").alias("__trunc_lsn")).filter(
            F.col("__trunc_lsn").isNotNull()
        )
        keyed = rest.select(key_col).distinct().crossJoin(F.broadcast(bnd))
    # synthesize DELETE@T rows matching the feed's full schema
    cols = []
    for c, dtype in rest.dtypes:
        if c == key_col or c in group_cols:
            cols.append(F.col(c))
        elif c == "lsn":
            cols.append(F.col("__trunc_lsn").cast(dtype).alias("lsn"))
        elif c == "operation":
            cols.append(F.lit(OP_DELETE).alias("operation"))
        else:
            cols.append(F.lit(None).cast(dtype).alias(c))
    return rest.unionByName(keyed.select(*cols))


def _fold_array(
    events: DataFrame, key_col: str, with_first_lsn: bool = False
) -> DataFrame:
    """Single-shuffle fold plan: ONE groupBy(key) collects each key's
    events and a JVM ``aggregate`` over the lsn-sorted array replays
    them — DELETE resets the accumulator (and records the boundary),
    a non-delete event merges its non-sentinel cells later-wins and
    advances ``last_lsn`` iff it carried any. Catalyst higher-order
    functions throughout; no Python, no extra shuffles.

    Trade-off vs the argmax plan (module docstring): one shuffle
    instead of three-plus-a-join, but ``collect_list`` concentrates a
    key's whole in-feed history on one task (no map-side combine, no
    per-column spreading), so the argmax plan remains the safer choice
    for feeds with adversarially hot keys. For the streaming state
    merge — where each batch contributes a bounded number of events per
    key and prior state exactly one — the array plan measures ~2×
    faster (tools/profile_apply_ceiling.py)."""
    sent = UNCHANGED_SENTINEL.replace("'", "''")
    filt = (
        "map_filter(coalesce(e.new_values, cast(map() as "
        f"map<string,string>)), (k2, v2) -> v2 is null or v2 != '{sent}')"
    )
    step = f"""named_struct(
      'vals', case
          when e.operation = '{OP_DELETE}'
            then cast(map() as map<string,string>)
          when cardinality({filt}) > 0
            then map_concat(
              map_filter(acc.vals, (k, v) -> not map_contains_key({filt}, k)),
              {filt})
          else acc.vals end,
      'last_lsn', case
          when e.operation = '{OP_DELETE}' then cast(null as bigint)
          when cardinality({filt}) > 0 then e.lsn
          else acc.last_lsn end,
      'del_lsn', case
          when e.operation = '{OP_DELETE}' then e.lsn
          else acc.del_lsn end)"""
    fold = f"""aggregate(
      array_sort(
        collect_list(struct(lsn, operation, new_values)),
        (l, r) -> case when l.lsn < r.lsn then -1
                       when l.lsn > r.lsn then 1 else 0 end),
      named_struct(
        'vals', cast(map() as map<string,string>),
        'last_lsn', cast(null as bigint),
        'del_lsn', cast(null as bigint)),
      (acc, e) -> {step})"""
    aggs = [F.expr(fold).alias("__a")]
    if with_first_lsn:
        aggs.append(F.min("lsn").alias("first_lsn"))
    return (
        events.groupBy(key_col)
        .agg(*aggs)
        .select(
            key_col,
            # sorted entries match the argmax plan's map key order, so
            # the two plans are value-identical downstream (the driver's
            # hash stringifies maps in entry order)
            F.expr(
                "case when cardinality(__a.vals) > 0 then "
                "map_from_entries(array_sort(map_entries(__a.vals))) end"
            ).alias("values"),
            F.col("__a.last_lsn").alias("last_lsn"),
            F.col("__a.del_lsn").alias("del_lsn"),
            *([F.col("first_lsn")] if with_first_lsn else []),
        )
    )


def apply_changes_with_tombstones(
    events: DataFrame,
    key_col: str = "key",
    plan: str = "argmax",
    has_truncates: bool | None = None,
    with_first_lsn: bool = False,
) -> DataFrame:
    """Fold a CDC feed into per-key state INCLUDING tombstones.

    Returns ``(key_col, values, last_lsn, del_lsn)`` where ``values`` is
    null for keys whose final standing event is DELETE, and ``del_lsn``
    records the last delete boundary. Tombstones are what make
    incremental (cross-batch) merging correct: a late event with
    ``lsn < del_lsn`` arriving in a later batch must NOT resurrect the
    row, so the boundary has to survive state collapsing.

    TRUNCATE events are honored by expansion into per-key deletes at
    the truncate LSN (``expand_truncates``) before the fold, so they
    inherit the same ordering, tombstone, and no-resurrection
    semantics. A caller that has already probed the feed (the streaming
    merge computes this per batch anyway) can pass
    ``has_truncates=False`` to skip the expansion's distinct-keys
    shuffle; ``None`` (the default) expands unconditionally — safe for
    any feed.

    ``plan`` selects the physical strategy: ``"argmax"`` (three keyed
    shuffles, hot-key histories spread across columns — the default)
    or ``"array_fold"`` (one shuffle, per-key event-array replay in
    JVM higher-order functions — see :func:`_fold_array` for when each
    wins). Both produce identical values.
    """
    if has_truncates is None or has_truncates:
        events = expand_truncates(events, key_col)
    if plan == "array_fold":
        return _fold_array(events, key_col, with_first_lsn=with_first_lsn)
    if plan != "argmax":
        raise ValueError(f"unknown fold plan {plan!r}")
    boundaries = _delete_boundary(events, key_col)
    live = (
        events.filter(F.col("operation") != OP_DELETE)
        .join(boundaries, key_col)
        .filter(F.col("lsn") > F.col("__last_delete_lsn"))
    )
    # Explode images to (key, column, value, lsn); the sentinel marks a
    # column NOT carried by this event, so it must not win the argmax.
    cells = (
        live.select(key_col, "lsn", F.explode("new_values").alias("column", "value"))
        .filter(F.col("value").isNull() | (F.col("value") != UNCHANGED_SENTINEL))
    )
    latest_cells = cells.groupBy(key_col, "column").agg(
        F.max_by("value", "lsn").alias("value"), F.max("lsn").alias("__lsn")
    )
    state = latest_cells.groupBy(key_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("column", "value")))
        ).alias("values"),
        F.max("__lsn").alias("last_lsn"),
    )
    return (
        boundaries.join(state, key_col, "left")
        .select(
            key_col,
            "values",
            "last_lsn",
            F.when(F.col("__last_delete_lsn") >= 0, F.col("__last_delete_lsn")).alias(
                "del_lsn"
            ),
            *(
                [F.col("__first_lsn").alias("first_lsn")]
                if with_first_lsn
                else []
            ),
        )
    )


def apply_changes_with_tombstones_multi(
    events: DataFrame,
    key_col: str = "key",
    plan: str = "argmax",
    has_truncates: bool | None = None,
    with_first_lsn: bool = False,
) -> DataFrame:
    """Tombstoned fold for a MULTI-TABLE feed: state is keyed by
    ``(schema, table, key)``, so equal key values in different tables
    never merge and TRUNCATE expansion stays per-table (a ``T`` frame
    for one relation must not tombstone another relation's rows —
    pgoutput scopes ``T`` to the listed relids, which decode_frames
    preserves as one event per relation).

    ``events`` must carry non-null ``schema``/``table`` columns on every
    keyed row (decoded wire events always do). TRUNCATE expansion runs
    FIRST, while the per-table columns are still separate, so the
    per-table boundary branch of :func:`expand_truncates` applies;
    the expanded feed then folds on a composite key and the table
    identity is split back out into state columns.

    Returns ``(schema, table, key_col, values, last_lsn, del_lsn)``.
    """
    sep = "\x1f"  # ASCII unit separator — cannot occur in identifiers
    expanded = (
        events if has_truncates is False else expand_truncates(events, key_col)
    )
    composite = expanded.withColumn(
        "__tk",
        F.concat_ws(
            sep,
            F.coalesce(F.col("schema").cast("string"), F.lit("")),
            F.coalesce(F.col("table").cast("string"), F.lit("")),
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
        ),
    ).drop("schema", "table", key_col)
    # expansion already ran (or was ruled out) above — the inner fold
    # must not pay a second distinct-keys pass over the composite feed
    folded = apply_changes_with_tombstones(
        composite, "__tk", plan=plan, has_truncates=False,
        with_first_lsn=with_first_lsn,
    )
    parts = F.split(F.col("__tk"), sep, 3)

    def _blank_null(c: Column) -> Column:
        return F.when(c != "", c)

    return folded.select(
        _blank_null(parts.getItem(0)).alias("schema"),
        _blank_null(parts.getItem(1)).alias("table"),
        _blank_null(parts.getItem(2)).alias(key_col),
        "values",
        "last_lsn",
        "del_lsn",
        *(["first_lsn"] if with_first_lsn else []),
    )


def apply_changes_all_tables(
    events: DataFrame, key_col: str = "key", plan: str = "argmax"
) -> DataFrame:
    """Apply-changes for a multi-table feed in one pass: state is keyed
    by (schema, table, key), so one job materializes every replicated
    table — the shape of a real publication with many tables
    (``/root/reference/init.sql:15`` publishes per-table; a fleet of
    tables shares the WAL stream). Output adds ``schema``/``table``.
    ``plan`` selects the physical fold strategy (argmax/array_fold, see
    :func:`apply_changes_with_tombstones` — value-identical, pinned by
    tests/test_apply_property.py).
    """
    sep = "\x1f"  # ASCII unit separator — cannot occur in identifiers
    composite = events.withColumn(
        "__tk",
        F.concat_ws(sep, F.col("schema"), F.col("table"), F.col(key_col)),
    )
    folded = apply_changes(composite, "__tk", plan=plan)
    parts = F.split(F.col("__tk"), sep)
    return folded.select(
        parts.getItem(0).alias("schema"),
        parts.getItem(1).alias("table"),
        parts.getItem(2).alias(key_col),
        "values",
        "last_lsn",
    )


def apply_changes(
    events: DataFrame, key_col: str = "key", plan: str = "argmax"
) -> DataFrame:
    """Fold a CDC feed into current state: one row per live key with a
    ``values`` map of the latest non-sentinel column values.

    Returns ``(key_col, values: map<string,string>, last_lsn)``. Keys
    whose final standing event is DELETE (with no later INSERT/UPDATE)
    disappear — the reference's end state after its golden sequence
    (``test_changes.py:73-91``: the test row is gone).
    """
    return (
        apply_changes_with_tombstones(events, key_col, plan=plan)
        .filter(F.col("values").isNotNull())
        .select(key_col, "values", "last_lsn")
    )


def apply_changes_typed(
    events: DataFrame, key_col: str, columns: dict[str, str]
) -> DataFrame:
    """Apply-changes with the ``values`` map pivoted to typed columns.

    ``columns`` maps output column name → Spark cast type (the cast layer
    for the reference's untyped string values, SURVEY.md §7 hard-part 4).
    """
    state = apply_changes(events, key_col)
    cols: list[Column] = [F.col(key_col), F.col("last_lsn")]
    for name, dtype in columns.items():
        cols.append(F.col("values").getItem(name).cast(dtype).alias(name))
    return state.select(*cols)


def state_as_events(state: DataFrame, key_col: str = "key") -> DataFrame:
    """Re-encode folded state rows as a minimal event feed so the fold's
    sentinel / delete-boundary semantics compose across batches: a live
    row becomes INSERT@last_lsn, a tombstone DELETE@del_lsn (BOTH rows
    for keys that were deleted then re-inserted). Table-identity columns
    (multi-table state) ride along. The replay-path building block of
    the streaming merge (``streaming/apply_stream.py``) and of
    :func:`merge_state_with_batch`'s late-event fallback."""
    aux = [F.col(c) for c in ("schema", "table") if c in state.columns]
    inserts = state.filter(F.col("values").isNotNull()).select(
        F.col("last_lsn").alias("lsn"),
        F.lit("INSERT").alias("operation"),
        F.col("values").alias("new_values"),
        *aux,
        F.col(key_col),
    )
    deletes = state.filter(F.col("del_lsn").isNotNull()).select(
        F.col("del_lsn").alias("lsn"),
        F.lit(OP_DELETE).alias("operation"),
        F.lit(None).cast("map<string,string>").alias("new_values"),
        *aux,
        F.col(key_col),
    )
    return inserts.unionByName(deletes)


def merge_state_with_batch(
    prior: DataFrame,
    batch_events: DataFrame,
    key_col: str = "key",
    plan: str = "array_fold",
) -> DataFrame:
    """Fold ONLY the batch, then merge the two folded states per key —
    the cheap alternative to replaying the whole prior state as events
    through the fold every micro-batch.

    The replay plan's cost is O(batch + state) EVENT-fold work per
    merge: every prior row is re-encoded as events and pushed through
    collect_list + array_sort + aggregate again, although it is already
    folded. Here the prior state crosses only a join, and the per-key
    combination is a handful of map expressions. Correctness hinges on
    one precondition per key: every batch event must be LATER than
    everything the prior row already folded (``first_lsn >
    greatest(last_lsn, del_lsn)``) — true for every key of an in-order
    replication stream, where batch N+1's LSNs all exceed batch N's.
    Keys that violate it (late events below the prior row's horizon —
    the cross-batch arrivals tombstones exist for) are detected from
    the two folded rows alone and routed through the full replay fold,
    so the merge NEVER changes semantics, only the physical plan; a
    hypothesis property test pins merge == replay across random batch
    splits including late and boundary-straddling events
    (tests/test_apply_property.py).

    Merge rules for a key present on both sides (all derivable from
    the fold's own invariants — values non-null ⇒ last_lsn non-null;
    tombstone ⇒ del_lsn non-null):

    - batch folded to a tombstone or delete-then-reinsert
      (``b.del_lsn`` set): the batch row wins outright — a delete
      resets the accumulator, so nothing of the prior row survives.
    - batch carried only sentinel cells (``b.values`` null, no
      delete): the prior row rides through unchanged.
    - otherwise: per-column later-wins — prior columns not present in
      the batch map persist, batch columns override
      (``map_concat(filter(prior), batch)``), entry-sorted to match
      the fold plans' canonical map order.

    Returns the same ``(aux?, key, values, last_lsn, del_lsn)`` shape
    as the fold itself. TRUNCATE batches must take the replay path
    (a truncate's expansion needs the full key set); this function
    assumes ``batch_events`` contains none.
    """
    aux = [c for c in ("schema", "table") if c in prior.columns]
    keys = aux + [key_col]
    fold = (
        apply_changes_with_tombstones_multi
        if aux
        else apply_changes_with_tombstones
    )
    ev = batch_events.select("lsn", "operation", "new_values", *keys)
    # The folded batch-state is referenced by BOTH branches (the merge
    # join and the slow-key detection); an eager checkpoint folds the
    # batch exactly once per merge instead of once per branch — and in
    # the streaming path it also stops the second branch from
    # re-decoding the batch's wire lineage.
    b = (
        fold(ev, key_col, plan=plan, has_truncates=False, with_first_lsn=True)
        .select(
            *keys,
            F.col("values").alias("__bv"),
            F.col("last_lsn").alias("__bl"),
            F.col("del_lsn").alias("__bd"),
            F.col("first_lsn").alias("__bf"),
        )
        .localCheckpoint(eager=True)
    )
    p = prior.select(*keys, "values", "last_lsn", "del_lsn")
    j = p.join(b, keys, "full_outer")

    pv, pl, pd_ = F.col("values"), F.col("last_lsn"), F.col("del_lsn")
    bv, bl, bd, bf = F.col("__bv"), F.col("__bl"), F.col("__bd"), F.col("__bf")
    p_absent = pl.isNull() & pd_.isNull()  # live rows carry last_lsn,
    b_absent = bf.isNull()                 # tombstones carry del_lsn
    fast = bf > F.greatest(pl, pd_)        # greatest skips nulls
    take = b_absent | p_absent | fast

    empty = F.expr("cast(map() as map<string,string>)")
    merged = F.map_from_entries(
        F.array_sort(
            F.map_entries(
                F.map_concat(
                    F.map_filter(
                        F.coalesce(pv, empty),
                        lambda k, v: ~F.map_contains_key(bv, k),
                    ),
                    bv,
                )
            )
        )
    )
    res_fast = j.filter(take).select(
        *keys,
        F.when(b_absent, pv)
        .when(p_absent | bd.isNotNull(), bv)
        .when(bv.isNull(), pv)
        .otherwise(merged)
        .alias("values"),
        F.when(b_absent, pl)
        .when(p_absent | bd.isNotNull(), bl)
        .when(bv.isNull(), pl)
        .otherwise(bl)
        .alias("last_lsn"),
        F.greatest(pd_, bd).alias("del_lsn"),
    )

    # late/straddling keys: full replay, identical to the classic path
    slow_keys = j.filter(~take).select(*keys)
    ev_slow = ev.join(slow_keys, keys, "left_semi")
    pr_slow = p.join(slow_keys, keys, "left_semi")
    replay = fold(
        ev_slow.unionByName(state_as_events(pr_slow, key_col)),
        key_col,
        plan=plan,
        has_truncates=False,
    )
    return res_fast.unionByName(replay.select(*res_fast.columns))
