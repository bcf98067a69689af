"""pgoutput binary codec tests: encode the reference's golden sequence
as real wire frames, decode distributed, apply, and check end state."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from python_cdc_spark.cdc.apply import apply_changes
from python_cdc_spark.cdc.pgoutput import (
    decode_frames,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
    relation_registry,
)
from python_cdc_spark.schemas import UNCHANGED_SENTINEL

USERS_COLS = ["id", "name", "email", "status"]
T0 = dt.datetime(2024, 1, 1)


def _frames_df(spark, frames):
    rows = [
        (i + 1, T0 + dt.timedelta(seconds=i), bytearray(f)) for i, f in enumerate(frames)
    ]
    return spark.createDataFrame(rows, "lsn bigint, ts timestamp, frame binary")


def test_golden_sequence_roundtrip(spark):
    """INSERT→UPDATE→DELETE over the wire → decode → apply → empty."""
    frames = [
        encode_relation(16385, "public", "users", USERS_COLS),
        encode_insert(16385, ["3", "Test User", "test@example.com", "active"]),
        encode_update(
            16385,
            ["3", "Updated User", "test@example.com", "inactive"],
            old_values=["3", "Test User", "test@example.com", "active"],
        ),
        encode_delete(16385, ["3", None, None, None], key_only=False),
    ]
    df = _frames_df(spark, frames)
    events = decode_frames(spark, df)
    got = events.orderBy("lsn").collect()
    assert [r["operation"] for r in got] == ["INSERT", "UPDATE", "DELETE"]
    assert got[0]["new_values"]["name"] == "Test User"
    assert got[1]["old_values"]["status"] == "active"
    assert got[1]["new_values"]["status"] == "inactive"
    assert got[0]["table"] == "users" and got[0]["schema"] == "public"

    keyed = events.withColumn(
        "key", F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"])
    )
    assert apply_changes(keyed, "key").count() == 0


def test_toast_and_key_only_images(spark):
    """'u' tuple tags decode to the sentinel; key-only deletes work."""
    frames = [
        encode_relation(1, "public", "docs", ["id", "body"]),
        encode_insert(1, ["7", "big blob"]),
        encode_update(1, ["7", UNCHANGED_SENTINEL], old_values=["7"], key_only=True),
    ]
    events = decode_frames(spark, _frames_df(spark, frames))
    upd = events.filter(F.col("operation") == "UPDATE").collect()[0]
    assert upd["new_values"]["body"] == UNCHANGED_SENTINEL
    assert upd["old_values"] == {"id": "7"}

    keyed = events.withColumn("key", F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"]))
    state = apply_changes(keyed, "key").collect()[0]
    assert state["values"]["body"] == "big blob"  # sentinel coalesced


def test_unknown_relation_and_txn_markers_dropped(spark):
    """Frames for unregistered relids and B/C markers are dropped
    (pg_output_parser.py:32-39,138-141 semantics)."""
    frames = [
        encode_relation(1, "public", "t", ["id"]),
        b"B" + b"\x00" * 20,  # Begin marker
        encode_insert(1, ["1"]),
        encode_insert(999, ["zz"]),  # unknown relid
        b"C" + b"\x00" * 25,  # Commit marker
    ]
    events = decode_frames(spark, _frames_df(spark, frames))
    assert events.count() == 1


def test_schema_evolution_by_replacement(spark):
    """A re-sent Relation message replaces the registry entry (dynamic
    schema discovery, pg_output_parser.py:88-93); each DML decodes with
    the version in force AT ITS LSN."""
    frames = [
        encode_relation(1, "public", "t", ["id", "a"]),
        encode_insert(1, ["1", "x"]),
        encode_relation(1, "public", "t", ["id", "a", "b"]),  # DDL added col
        encode_insert(1, ["2", "y", "z"]),
    ]
    df = _frames_df(spark, frames)
    reg = relation_registry(df)
    assert reg[1]["columns"] == ["id", "a", "b"]
    events = decode_frames(spark, df).orderBy("lsn").collect()
    # both rows decode; the later one carries the new column — and the
    # PRE-DDL event's columns list is its OWN version's, not the final
    assert events[0]["new_values"] == {"id": "1", "a": "x"}
    assert events[0]["columns"] == ["id", "a"]
    assert events[1]["new_values"] == {"id": "2", "a": "y", "b": "z"}
    assert events[1]["columns"] == ["id", "a", "b"]


def test_schema_evolution_rename_is_lsn_versioned(spark):
    """The distributed-decode case the reference's serial overwrite
    hides: a mid-stream column RENAME (same arity, so positional
    mapping cannot save it). Pre-DDL tuples must decode with the OLD
    name, post-DDL with the NEW — a latest-wins registry would silently
    stamp the new name onto history."""
    frames = [
        encode_relation(1, "public", "t", ["id", "amount"]),
        encode_insert(1, ["1", "10"]),
        encode_relation(1, "public", "t", ["id", "amount_usd"]),  # rename
        encode_insert(1, ["2", "20"]),
        encode_update(1, ["1", "11"]),
    ]
    events = decode_frames(spark, _frames_df(spark, frames)).orderBy("lsn").collect()
    assert events[0]["new_values"] == {"id": "1", "amount": "10"}
    assert events[1]["new_values"] == {"id": "2", "amount_usd": "20"}
    assert events[2]["new_values"] == {"id": "1", "amount_usd": "11"}


def test_dml_below_first_relation_version_clamps_to_earliest(spark):
    """A DML whose LSN precedes its relid's first versioned R frame
    decodes with that EARLIEST version — the documented deviation from
    the reference serial consumer, which would drop such a frame as
    unknown-relation (a live wire always sends R before a relation's
    first DML; only synthetic/file feeds hit this). Pins: (a) the
    pre-R DML decodes with version 1's names, not a later version's,
    and (b) it is NOT dropped."""
    frames = [
        encode_insert(1, ["1", "5"]),  # LSN 1 — BELOW the first R frame
        encode_relation(1, "public", "t", ["id", "amount"]),  # LSN 2, v1
        encode_insert(1, ["2", "6"]),
        encode_relation(1, "public", "t", ["id", "amount_usd"]),  # LSN 4, v2
        encode_insert(1, ["3", "7"]),
    ]
    events = decode_frames(spark, _frames_df(spark, frames)).orderBy("lsn").collect()
    assert len(events) == 3  # the below-first-version DML survives
    assert events[0]["new_values"] == {"id": "1", "amount": "5"}  # clamped to v1
    assert events[1]["new_values"] == {"id": "2", "amount": "6"}
    assert events[2]["new_values"] == {"id": "3", "amount_usd": "7"}


def test_full_wire_to_state_streaming_pipeline(spark, tmp_path):
    """The reference's whole job, end to end on Structured Streaming:
    binary pgoutput frames → distributed decode → continuous apply →
    materialized state. (Registry passed statically, as a stream cannot
    self-collect relations; in production it comes from the snapshot.)"""
    import pyspark.sql.functions as SF

    from python_cdc_spark.streaming import StreamingApplyChanges

    frames = [
        encode_relation(16385, "public", "users", USERS_COLS),
        encode_insert(16385, ["1", "Ada", "ada@example.com", "active"]),
        encode_insert(16385, ["2", "Lin", "lin@example.com", "active"]),
        encode_update(
            16385,
            ["1", "Ada L", UNCHANGED_SENTINEL, "inactive"],
            old_values=["1"],
            key_only=True,
        ),
        encode_delete(16385, ["2", None, None, None], key_only=True),
    ]
    feed = _frames_df(spark, frames)
    reg = relation_registry(feed)
    wire_dir = str(tmp_path / "wire")
    feed.write.parquet(wire_dir)

    stream = (
        spark.readStream.schema("lsn bigint, ts timestamp, frame binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(wire_dir)
    )
    events = decode_frames(spark, stream, registry=reg).withColumn(
        "key", SF.coalesce(SF.col("new_values")["id"], SF.col("old_values")["id"])
    )
    applier = StreamingApplyChanges(spark, str(tmp_path / "state"), "key", n_buckets=4)
    q = applier.start(events, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    state = {r["key"]: dict(r["values"]) for r in applier.current_state().collect()}
    assert state == {
        "1": {
            "id": "1",
            "name": "Ada L",
            "email": "ada@example.com",  # TOASTed column survived
            "status": "inactive",
        }
    }


def test_binary_tuple_tag_decodes_to_hex(spark):
    """'b' tuple values decode to hex strings, the reference's binary
    handling (pg_output_parser.py:122-126)."""
    frames = [
        encode_relation(2, "public", "blobs", ["id", "payload"]),
        encode_insert(2, ["1", b"\x00\xffhello"]),
        encode_update(2, ["1", b"\xde\xad\xbe\xef"], old_values=["1", b"\x00\xffhello"]),
    ]
    events = decode_frames(spark, _frames_df(spark, frames)).orderBy("lsn").collect()
    assert events[0]["new_values"]["payload"] == b"\x00\xffhello".hex()
    assert events[1]["old_values"]["payload"] == "00ff68656c6c6f"
    assert events[1]["new_values"]["payload"] == "deadbeef"


def test_poison_frames_skipped_not_fatal(spark):
    """One corrupt frame must not fail the batch: truncated tuple data,
    unknown tuple tag, and garbage bytes are all dropped while good
    frames around them decode (the reference's per-message guard,
    postgre_cdc_consumer.py:91-105)."""
    import struct as _struct

    good1 = encode_insert(3, ["1", "ok"])
    truncated = encode_insert(3, ["2", "chopped"])[:-4]
    bad_tag = b"I" + _struct.pack(">i", 3) + b"N" + _struct.pack(">h", 1) + b"z"
    garbage = b"I\x00"
    good2 = encode_insert(3, ["4", "also ok"])
    frames = [
        encode_relation(3, "public", "t", ["id", "v"]),
        good1,
        truncated,
        bad_tag,
        garbage,
        good2,
    ]
    events = decode_frames(spark, _frames_df(spark, frames)).orderBy("lsn").collect()
    assert [r["new_values"]["id"] for r in events] == ["1", "4"]


def test_relation_registry_retains_type_oids(spark):
    """Per-column type OIDs are recorded in the registry, matching the
    reference's registry shape (pg_output_parser.py:86)."""
    frames = [encode_relation(5, "public", "users", ["id", "name"])]
    reg = relation_registry(_frames_df(spark, frames))
    assert reg[5]["columns"] == ["id", "name"]
    assert reg[5]["type_ids"] == [25, 25]  # encoder stamps text (25)


def test_truncate_frame_clears_tables_batch_and_streaming(spark, tmp_path):
    """A TRUNCATE frame decodes to one event per registered relation and
    the apply honors it in LSN order: rows before the truncate die
    (tombstoned at the truncate LSN), rows inserted after it live; a
    late sub-boundary event in a LATER micro-batch must not resurrect —
    and the streaming apply must agree with the batch apply."""
    import json
    import os

    from python_cdc_spark.cdc.pgoutput import encode_truncate
    from python_cdc_spark.streaming.apply_stream import StreamingApplyChanges

    frames = [
        encode_relation(16385, "public", "users", USERS_COLS),
        encode_insert(16385, ["1", "A", "a@x", "active"]),
        encode_insert(16385, ["2", "B", "b@x", "active"]),
        # lsn 4: clears both rows (unknown relid 99 in the same frame
        # drops silently, like any unregistered relation)
        encode_truncate([16385, 99]),
        encode_insert(16385, ["2", "B2", "b2@x", "active"]),
    ]
    df = _frames_df(spark, frames)
    events = decode_frames(spark, df)
    ops = [r["operation"] for r in events.orderBy("lsn").collect()]
    assert ops.count("TRUNCATE") == 1  # one registered relation listed

    keyed = events.withColumn(
        "key", F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"])
    )
    got = {r["key"]: dict(r["values"]) for r in apply_changes(keyed, "key").collect()}
    assert set(got) == {"2"} and got["2"]["name"] == "B2"

    # streaming: batch 1 = up to the truncate, batch 2 = the re-insert,
    # batch 3 = a LATE event from before the boundary (must stay dead)
    feed = tmp_path / "feed"
    feed.mkdir()
    rows = [r.asDict() for r in keyed.orderBy("lsn").collect()]
    batches = [rows[:4], rows[4:5]]
    late = dict(rows[0], lsn=3, operation="UPDATE",
                new_values={"id": "1", "name": "GHOST"})
    batches.append([late])
    for i, b in enumerate(batches):
        with open(os.path.join(str(feed), f"f{i}.json"), "w") as f:
            for e in b:
                e = dict(e)
                e["ts"] = None
                f.write(json.dumps(e) + "\n")

    from python_cdc_spark.cdc.feed import read_feed_stream

    stream = read_feed_stream(spark, str(feed), max_files_per_trigger=1).withColumn(
        "key", F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"])
    )
    applier = StreamingApplyChanges(spark, str(tmp_path / "state"), "key", n_buckets=4)
    q = applier.start(stream, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    streamed = {
        r["key"]: dict(r["values"]) for r in applier.current_state().collect()
    }
    assert streamed == got  # ghost stayed dead; streaming == batch


def test_control_frames_decode_and_dml_path_ignores_them(spark):
    """Origin/Type/Message frames — the three the reference's dispatch
    falls through on (pg_output_parser.py:32-39) — decode on the
    control stream with their documented fields, while the DML decoder
    keeps dropping them; malformed control frames drop (R14)."""
    from python_cdc_spark.cdc.pgoutput import (
        decode_control_frames,
        encode_message,
        encode_origin,
        encode_type,
    )

    frames = [
        encode_relation(7, "public", "users", ["id"]),
        encode_origin(991234, "region_a"),
        encode_type(60001, "public", "mood_enum"),
        encode_message("audit", b"\x01\x02payload", transactional=True, lsn=55),
        encode_insert(7, ["1"]),
        encode_message("x", b"abc")[:-2],  # truncated payload: drop
    ]
    df = _frames_df(spark, frames)

    ctl = {r["kind"]: r for r in decode_control_frames(spark, df).collect()}
    assert set(ctl) == {"ORIGIN", "TYPE", "MESSAGE"}
    assert ctl["ORIGIN"]["name"] == "region_a"
    assert ctl["ORIGIN"]["origin_lsn"] == 991234
    assert ctl["TYPE"]["name"] == "public.mood_enum"
    assert ctl["TYPE"]["type_oid"] == 60001
    assert ctl["MESSAGE"]["name"] == "audit"
    assert ctl["MESSAGE"]["transactional"] is True
    assert bytes(ctl["MESSAGE"]["content"]) == b"\x01\x02payload"

    # the DML path is unchanged: only the insert decodes
    events = decode_frames(spark, df)
    assert [r["operation"] for r in events.collect()] == ["INSERT"]


def test_origin_annotation_and_loop_filtering(spark):
    """Replication-origin subscriber semantics: a txn carrying an ``O``
    frame belongs to that origin until the next BEGIN resets to local;
    ``origin='none'`` keeps only local txns. bucket_width=4 forces the
    cross-bucket carry (insert at lsn 8 sits in a bucket with no
    marker), and BEGIN at lsn 10 must override the carry in-bucket."""
    from python_cdc_spark.cdc.origins import annotate_origins, filter_by_origin
    from python_cdc_spark.cdc.pgoutput import (
        encode_begin,
        encode_commit,
        encode_origin,
    )

    frames = [
        encode_relation(7, "public", "users", ["id"]),  # lsn 1
        encode_begin(),                                 # lsn 2 — local txn
        encode_insert(7, ["1"]),                        # lsn 3
        encode_commit(),                                # lsn 4
        encode_begin(),                                 # lsn 5 — replayed txn
        encode_origin(55, "region_b"),                  # lsn 6
        encode_insert(7, ["2"]),                        # lsn 7 (same bucket)
        encode_insert(7, ["3"]),                        # lsn 8 (carry bucket)
        encode_commit(),                                # lsn 9
        encode_begin(),                                 # lsn 10 — local again
        encode_insert(7, ["4"]),                        # lsn 11
        encode_commit(),                                # lsn 12
    ]
    df = _frames_df(spark, frames)
    events = decode_frames(spark, df)
    ann = annotate_origins(spark, events, df, bucket_width=4)
    got = {r["new_values"]["id"]: r["origin"] for r in ann.collect()}
    assert got == {"1": None, "2": "region_b", "3": "region_b", "4": None}
    kept = filter_by_origin(ann, "none")
    assert sorted(r["new_values"]["id"] for r in kept.collect()) == ["1", "4"]
    assert filter_by_origin(ann, "any").count() == 4
    allowed = filter_by_origin(ann, {"region_b"})
    assert allowed.count() == 4  # explicit allow-list keeps the origin
    # a BARE name is a one-element allow-list, not an iterable of chars
    assert filter_by_origin(ann, "region_b").count() == 4
    assert filter_by_origin(ann, "region_c").count() == 2  # local only


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DDL_COLS = ["id", "a", "b", "c", "d"]

_action_st = st.one_of(
    st.tuples(
        st.just("ddl"),
        st.lists(st.sampled_from(_DDL_COLS), unique=True, min_size=1, max_size=5),
    ),
    st.tuples(st.just("ins"), st.integers(min_value=0, max_value=99)),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from(_DDL_COLS), unique=True, min_size=1, max_size=5),
    st.lists(_action_st, min_size=1, max_size=20),
)
def test_versioned_decode_matches_serial_consumer(spark, first_cols, actions):
    """Property: for ANY interleaving of Relation re-definitions
    (renames, drops, reorders, adds) and inserts, the distributed
    LSN-versioned decode equals a serial consumer that overwrites its
    registry in stream order — the reference's exact semantics
    (pg_output_parser.py:88). Each insert is encoded with the schema
    in force when it was produced, as a real producer would."""
    frames, expect = [], []
    cur = list(first_cols)
    frames.append(encode_relation(1, "public", "t", cur))
    for kind, arg in actions:
        if kind == "ddl":
            cur = list(arg)
            frames.append(encode_relation(1, "public", "t", cur))
        else:
            vals = [f"v{arg}_{i}" for i in range(len(cur))]
            frames.append(encode_insert(1, vals))
            # a serial consumer decodes with ITS current registry entry
            expect.append((len(frames), dict(zip(cur, vals)), list(cur)))
    got = [
        (r["lsn"], dict(r["new_values"]), list(r["columns"]))
        for r in decode_frames(spark, _frames_df(spark, frames))
        .orderBy("lsn")
        .collect()
    ]
    assert got == expect
