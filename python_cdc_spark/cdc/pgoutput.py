"""pgoutput binary frame codec: the reference's core capability (R3–R8),
re-expressed for distributed execution.

The reference decodes Postgres logical-replication ``pgoutput`` frames
one at a time on a single thread, holding the relation registry as
process state (``/root/reference/utils/pg_output_parser.py:13,15-39``).
Here the same wire format is handled in two Spark passes:

1. ``relation_registry_versions`` — scan ONLY ``R`` (Relation) frames
   (they are rare: one per table per session/DDL) and build the relid →
   LSN-versioned schema registry as a small driver-side dict, exactly
   the dynamic schema-discovery role of the reference's
   ``_parse_relation`` (``pg_output_parser.py:41-97``) but derived once
   and broadcast. The version axis keeps the reference's serial
   overwrite semantics correct under distributed decode: each DML
   resolves the relation version in force at its own LSN.
2. ``decode_frames`` — Arrow-batched ``mapInPandas`` over the data
   frames (``I``/``U``/``D``), each worker decoding with the broadcast
   registry. Frames referencing an unregistered relid are dropped, as
   the reference does with a warning (``pg_output_parser.py:138-141``).

Wire format implemented from the public PostgreSQL docs
(protocol/logicalrep-message-formats, proto_version 1 — the version the
reference requests at ``postgre_cdc_consumer.py:77``):

- ``R``: relid int32, namespace cstr, relname cstr, replident int8,
  ncols int16, then per column: flags int8, name cstr, typoid int32,
  typmod int32.
- ``I``: relid int32, 'N', TupleData.
- ``U``: relid int32, optional ('K'|'O') TupleData, 'N', TupleData.
- ``D``: relid int32, ('K'|'O') TupleData.
- ``B``/``C``: transaction markers (skipped, like
  ``pg_output_parser.py:32-37``).
- TupleData: ncols int16, per column one of 'n' (null), 'u' (TOASTed
  unchanged → the ``[unchanged]`` sentinel), 't' int32 len + bytes
  (UTF-8 text, matching the reference's text decoding,
  ``pg_output_parser.py:114-121``), or 'b' int32 len + raw bytes
  (binary, decoded to a hex string exactly like the reference,
  ``pg_output_parser.py:122-126``).

A malformed data frame is skipped (logged-and-continue in the
reference's per-message guard, ``postgre_cdc_consumer.py:91-105``);
here the per-frame try/except lives inside the Arrow batch loop so one
poison frame never fails its partition's task.

``encode_*`` helpers produce the same format for fixtures/tests — this
repo's analog of the reference's ``test_changes.py`` change generator.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.schemas import CDC_EVENT_SCHEMA, UNCHANGED_SENTINEL

# ---------------------------------------------------------------------------
# encoding (fixture/test producer side)
# ---------------------------------------------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def encode_relation(
    relid: int,
    namespace: str,
    relname: str,
    columns: list[str],
    replica_identity: str = "f",
) -> bytes:
    out = [b"R", struct.pack(">i", relid), _cstr(namespace), _cstr(relname)]
    out.append(replica_identity.encode())
    out.append(struct.pack(">h", len(columns)))
    for name in columns:
        out.append(struct.pack(">b", 1))  # flags: part of key
        out.append(_cstr(name))
        out.append(struct.pack(">i", 25))  # typoid: text
        out.append(struct.pack(">i", -1))  # typmod
    return b"".join(out)


def _encode_tuple(values: list[Any]) -> bytes:
    out = [struct.pack(">h", len(values))]
    for v in values:
        if v is None:
            out.append(b"n")
        elif isinstance(v, (bytes, bytearray)):
            out.append(b"b" + struct.pack(">i", len(v)) + bytes(v))
        elif v is UNCHANGED_SENTINEL or v == UNCHANGED_SENTINEL:
            out.append(b"u")
        else:
            b = str(v).encode("utf-8")
            out.append(b"t" + struct.pack(">i", len(b)) + b)
    return b"".join(out)


def encode_insert(relid: int, values: list[Any]) -> bytes:
    return b"I" + struct.pack(">i", relid) + b"N" + _encode_tuple(values)


def encode_update(
    relid: int,
    new_values: list[Any],
    old_values: list[Any] | None = None,
    key_only: bool = False,
) -> bytes:
    out = [b"U", struct.pack(">i", relid)]
    if old_values is not None:
        out.append(b"K" if key_only else b"O")
        out.append(_encode_tuple(old_values))
    out.append(b"N")
    out.append(_encode_tuple(new_values))
    return b"".join(out)


def encode_delete(relid: int, old_values: list[Any], key_only: bool = True) -> bytes:
    return (
        b"D"
        + struct.pack(">i", relid)
        + (b"K" if key_only else b"O")
        + _encode_tuple(old_values)
    )


def encode_truncate(relids: list[int], options: int = 0) -> bytes:
    """Truncate message (public wire format: Int32 nrelations, Int8
    option bits — CASCADE=1, RESTART IDENTITY=2 — then Int32 per
    relation OID). One frame can clear several tables atomically."""
    out = [b"T", struct.pack(">i", len(relids)), struct.pack(">b", options)]
    for relid in relids:
        out.append(struct.pack(">i", relid))
    return b"".join(out)


def encode_begin(final_lsn: int = 0, commit_ts: int = 0, xid: int = 1) -> bytes:
    """Begin frame (protocol.sgml: Int64 final LSN of the txn, Int64
    commit timestamp in µs since 2000-01-01, Int32 xid). The DML
    decoder drops it (R9); the origin resolver treats it as the
    reset-to-local marker."""
    return b"B" + struct.pack(">qqi", final_lsn, commit_ts, xid)


def encode_commit(commit_lsn: int = 0, end_lsn: int = 0,
                  commit_ts: int = 0) -> bytes:
    """Commit frame (Int8 flags=0, Int64 commit LSN, Int64 end LSN,
    Int64 commit timestamp)."""
    return b"C" + struct.pack(">bqqq", 0, commit_lsn, end_lsn, commit_ts)


def encode_origin(commit_lsn: int, name: str) -> bytes:
    """Origin message (public wire format, protocol.sgml: Int64 commit
    LSN on the origin, then the origin name as a C string) — emitted by
    cascading publishers so subscribers can filter replayed changes."""
    return b"O" + struct.pack(">q", commit_lsn) + _cstr(name)


def encode_type(type_oid: int, namespace: str, name: str) -> bytes:
    """Type message (Int32 OID, namespace cstr, name cstr): maps a
    custom type OID — the ones relation frames carry in ``type_ids`` —
    to its qualified name."""
    return b"Y" + struct.pack(">i", type_oid) + _cstr(namespace) + _cstr(name)


def encode_message(prefix: str, content: bytes, transactional: bool = True,
                   lsn: int = 0) -> bytes:
    """Logical decoding message (``pg_logical_emit_message``): Int8
    transactional flag, Int64 LSN, prefix cstr, Int32 length, bytes."""
    return (
        b"M"
        + struct.pack(">b", 1 if transactional else 0)
        + struct.pack(">q", lsn)
        + _cstr(prefix)
        + struct.pack(">i", len(content))
        + content
    )


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------


def _read_cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _parse_relation_frame(buf: bytes) -> tuple[int, dict]:
    relid = struct.unpack_from(">i", buf, 1)[0]
    pos = 5
    namespace, pos = _read_cstr(buf, pos)
    relname, pos = _read_cstr(buf, pos)
    replident = chr(buf[pos])
    pos += 1
    (ncols,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    cols = []
    type_ids = []
    for _ in range(ncols):
        pos += 1  # flags
        name, pos = _read_cstr(buf, pos)
        (typoid,) = struct.unpack_from(">i", buf, pos)
        pos += 8  # typoid + typmod
        cols.append(name)
        # per-column type OID retained like the reference's registry
        # (pg_output_parser.py:86) — recorded, not used for decoding
        type_ids.append(typoid)
    return relid, {
        "namespace": namespace,
        "relname": relname,
        "replica_identity": replident,
        "columns": cols,
        "type_ids": type_ids,
    }


def _parse_tuple(buf: bytes, pos: int, columns: list[str]) -> tuple[dict, int]:
    (ncols,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    vals: dict[str, Any] = {}
    for i in range(ncols):
        tag = chr(buf[pos])
        pos += 1
        name = columns[i] if i < len(columns) else f"col_{i}"
        if tag == "n":
            vals[name] = None
        elif tag == "u":
            vals[name] = UNCHANGED_SENTINEL
        elif tag == "t":
            (ln,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            if pos + ln > len(buf):
                raise ValueError("truncated tuple value")
            vals[name] = buf[pos : pos + ln].decode("utf-8", errors="replace")
            pos += ln
        elif tag == "b":
            # binary value → hex string, like the reference
            # (pg_output_parser.py:122-126)
            (ln,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            if pos + ln > len(buf):
                raise ValueError("truncated tuple value")
            vals[name] = buf[pos : pos + ln].hex()
            pos += ln
        else:
            raise ValueError(f"unknown tuple tag {tag!r}")
    return vals, pos


def relation_registry_versions(
    frames: DataFrame, frame_col: str = "frame"
) -> dict[int, list[tuple[int, dict]]]:
    """Pass 1: the relid → LSN-versioned relation list from all ``R``
    frames, each entry ``(valid_from_lsn, rel)`` sorted ascending.

    Relation frames are O(tables × DDLs), not O(rows), so collecting
    them to the driver is safe at any scale; the registry broadcasts to
    pass 2. The reference holds ONE entry per relid and overwrites it
    in stream order (``pg_output_parser.py:88``) — correct for a serial
    consumer, where each DML naturally sees the most recent ``R`` frame
    before it. A distributed decode sees the whole feed at once, so the
    same semantics need the version axis kept explicit: a DML frame
    decodes with the relation version whose LSN is the greatest at or
    below its own. Without it, a mid-stream column rename/drop/reorder
    would silently mis-map every PRE-DDL tuple to the post-DDL names.
    """
    rel_rows = (
        frames.filter(F.substring(frame_col, 1, 1) == "R")
        .select("lsn", frame_col)
        .collect()
    )
    versions: dict[int, list[tuple[int, dict]]] = {}
    for row in sorted(rel_rows, key=lambda r: r["lsn"]):
        relid, rel = _parse_relation_frame(bytes(row[frame_col]))
        versions.setdefault(relid, []).append((int(row["lsn"]), rel))
    return versions


def relation_registry(frames: DataFrame, frame_col: str = "frame") -> dict[int, dict]:
    """Latest-wins projection of :func:`relation_registry_versions` —
    the reference's single-entry registry shape (the view a consumer
    holds AFTER draining the feed), kept for callers that carry the
    registry across batches themselves."""
    return {
        relid: vers[-1][1]
        for relid, vers in relation_registry_versions(frames, frame_col).items()
    }


# a plain (unversioned) registry entry is valid from the beginning of
# the LSN axis — the carried-across-batches / snapshot-seeded case
_LSN_MIN = -(1 << 63)


def _normalize_registry(
    registry: dict[int, Any],
) -> dict[int, tuple[list[int], list[dict]]]:
    """Accept either shape — ``{relid: rel}`` (unversioned: valid from
    the start, the streaming carry / snapshot seed) or
    ``{relid: [(lsn, rel), ...]}`` — and return parallel
    ``(valid_from_lsns, rels)`` lists per relid for bisect lookup."""
    norm: dict[int, tuple[list[int], list[dict]]] = {}
    for relid, entry in registry.items():
        if isinstance(entry, dict):
            norm[relid] = ([_LSN_MIN], [entry])
        else:
            vers = sorted(entry, key=lambda v: v[0])
            norm[relid] = ([v[0] for v in vers], [v[1] for v in vers])
    return norm


def decode_frames(
    spark: SparkSession,
    frames: DataFrame,
    frame_col: str = "frame",
    registry: dict[int, dict] | dict[int, list[tuple[int, dict]]] | None = None,
) -> DataFrame:
    """Pass 2: binary pgoutput frames → typed CDC events.

    Input needs (lsn bigint, ts timestamp, frame binary). Unknown
    message types (B/C/keepalives) and unregistered relids are dropped,
    mirroring ``parse_message``'s fall-through and the unknown-relation
    guard. Decoding runs Arrow-batched per partition — the single
    consumer loop becomes scan-parallel.

    ``registry`` takes either shape: ``{relid: rel}`` (valid for the
    whole feed — the streaming carry) or the LSN-versioned
    ``{relid: [(valid_from_lsn, rel), ...]}`` from
    :func:`relation_registry_versions`; the default self-scan uses the
    versioned form so a mid-stream DDL (re-sent ``R`` frame) decodes
    each DML with the relation version in force AT ITS LSN, matching
    the reference's serial stream-order overwrite. A DML below its
    relid's first known version decodes with that earliest version
    (on a real wire ``R`` always precedes the relation's first DML in
    a session, so this arises only in synthetic/file feeds — the
    forgiving choice keeps snapshot-style fixtures decodable).
    """
    from bisect import bisect_right

    if registry is None:
        registry = relation_registry_versions(frames, frame_col)
    breg = spark.sparkContext.broadcast(_normalize_registry(registry))

    def decode(batches: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        reg = breg.value

        def rel_at(relid: int, lsn: int) -> dict | None:
            entry = reg.get(relid)
            if entry is None:
                return None
            lsns, rels = entry
            return rels[max(bisect_right(lsns, lsn) - 1, 0)]
        for pdf in batches:
            out = {k: [] for k in (
                "lsn", "operation", "schema", "table", "columns",
                "old_values", "new_values", "ts",
            )}
            for lsn, ts, buf in zip(pdf["lsn"], pdf["ts"], pdf["frame"]):
                # Poison-message skip (R14): any malformed frame —
                # truncated buffer, bad tuple tag, struct underflow — is
                # dropped without failing the task, the distributed analog
                # of the reference's per-message try/except-continue
                # (postgre_cdc_consumer.py:91-105).
                try:
                    buf = bytes(buf)
                    tag = chr(buf[0]) if buf else "?"
                    if tag == "T":
                        # Truncate: Int32 nrelations, Int8 options
                        # (CASCADE/RESTART IDENTITY — decoded, not
                        # needed for apply), Int32[] relids. Emit ONE
                        # event per registered relation so the apply
                        # side can clear each table at this LSN;
                        # unregistered relids drop like any other
                        # unknown-relation frame (R10).
                        (nrel,) = struct.unpack_from(">i", buf, 1)
                        for j in range(nrel):
                            (t_relid,) = struct.unpack_from(">i", buf, 6 + 4 * j)
                            t_rel = rel_at(t_relid, int(lsn))
                            if t_rel is None:
                                continue
                            out["lsn"].append(int(lsn))
                            out["operation"].append("TRUNCATE")
                            out["schema"].append(t_rel["namespace"])
                            out["table"].append(t_rel["relname"])
                            out["columns"].append(t_rel["columns"])
                            out["old_values"].append(None)
                            out["new_values"].append(None)
                            out["ts"].append(ts)
                        continue
                    if tag not in ("I", "U", "D"):
                        continue
                    relid = struct.unpack_from(">i", buf, 1)[0]
                    rel = rel_at(relid, int(lsn))
                    if rel is None:
                        continue  # unknown relation: drop (R10)
                    cols = rel["columns"]
                    pos = 5
                    old_vals = new_vals = None
                    op = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[tag]
                    if tag == "I":
                        if chr(buf[pos]) != "N":
                            continue  # malformed: drop (R10)
                        new_vals, pos = _parse_tuple(buf, pos + 1, cols)
                    elif tag == "U":
                        marker = chr(buf[pos])
                        if marker in ("K", "O"):
                            old_vals, pos = _parse_tuple(buf, pos + 1, cols)
                            marker = chr(buf[pos])
                        if marker != "N":
                            continue
                        new_vals, pos = _parse_tuple(buf, pos + 1, cols)
                    else:  # D
                        marker = chr(buf[pos])
                        if marker not in ("K", "O"):
                            continue
                        old_vals, pos = _parse_tuple(buf, pos + 1, cols)
                except (ValueError, IndexError, struct.error, UnicodeDecodeError):
                    continue
                out["lsn"].append(int(lsn))
                out["operation"].append(op)
                out["schema"].append(rel["namespace"])
                out["table"].append(rel["relname"])
                out["columns"].append(cols)
                out["old_values"].append(old_vals)
                out["new_values"].append(new_vals)
                out["ts"].append(ts)
            if out["lsn"]:
                # (an empty dict-of-lists DataFrame defaults every column
                # to float64, which Arrow can't cast to list/map types)
                yield pd.DataFrame(out)

    return frames.select("lsn", "ts", frame_col).mapInPandas(decode, CDC_EVENT_SCHEMA)


CONTROL_FRAME_SCHEMA = (
    "lsn bigint, ts timestamp, kind string, name string, "
    "origin_lsn bigint, type_oid int, transactional boolean, "
    "content binary"
)


def decode_control_frames(spark: SparkSession, frames: DataFrame,
                          frame_col: str = "frame") -> DataFrame:
    """Decode the NON-DML control frames the DML decoder (and the
    reference, ``pg_output_parser.py:32-39``) drops: Origin (``O``),
    Type (``Y``), and logical-decoding Message (``M``).

    These carry no apply-side semantics (filtering replayed changes by
    origin is a publisher-topology concern; type names annotate the
    ``type_ids`` relation frames already expose; messages are
    application-defined), so they are surfaced as a SEPARATE observable
    stream instead of widening the DML event schema:

    - ``O`` → (kind='ORIGIN', name=origin name, origin_lsn=Int64
      commit LSN on the origin)
    - ``Y`` → (kind='TYPE', name='namespace.typename', type_oid)
    - ``M`` → (kind='MESSAGE', name=prefix, transactional flag,
      content bytes)

    Same scale shape as ``decode_frames``: Arrow ``mapInPandas``,
    partition-parallel, malformed frames dropped (R14). Cite:
    PostgreSQL protocol.sgml "Logical Replication Message Formats".
    """

    def decode(batches: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "lsn", "ts", "kind", "name", "origin_lsn", "type_oid",
                "transactional", "content",
            )}

            def emit(lsn, ts, kind, name, origin_lsn=None, type_oid=None,
                     transactional=None, content=None):
                out["lsn"].append(int(lsn))
                out["ts"].append(ts)
                out["kind"].append(kind)
                out["name"].append(name)
                out["origin_lsn"].append(origin_lsn)
                out["type_oid"].append(type_oid)
                out["transactional"].append(transactional)
                out["content"].append(content)

            for lsn, ts, buf in zip(pdf["lsn"], pdf["ts"], pdf[frame_col]):
                try:
                    buf = bytes(buf)
                    tag = chr(buf[0]) if buf else "?"
                    if tag == "O":
                        (commit_lsn,) = struct.unpack_from(">q", buf, 1)
                        name, _ = _read_cstr(buf, 9)
                        emit(lsn, ts, "ORIGIN", name, origin_lsn=commit_lsn)
                    elif tag == "Y":
                        (oid,) = struct.unpack_from(">i", buf, 1)
                        ns, pos = _read_cstr(buf, 5)
                        tname, _ = _read_cstr(buf, pos)
                        emit(lsn, ts, "TYPE", f"{ns}.{tname}", type_oid=oid)
                    elif tag == "M":
                        flag = buf[1] != 0
                        prefix, pos = _read_cstr(buf, 10)
                        (clen,) = struct.unpack_from(">i", buf, pos)
                        content = buf[pos + 4:pos + 4 + clen]
                        if len(content) != clen:
                            continue  # truncated payload: drop (R14)
                        emit(lsn, ts, "MESSAGE", prefix,
                             transactional=flag, content=bytearray(content))
                except (ValueError, IndexError, struct.error,
                        UnicodeDecodeError):
                    continue
            if out["lsn"]:
                yield pd.DataFrame(out)

    return frames.select("lsn", "ts", frame_col).mapInPandas(
        decode, CONTROL_FRAME_SCHEMA
    )
