"""Live-source parity: the pure-stdlib logical-replication client
(`cdc/replication_client.py`) driven against a scripted fake Postgres
speaking the real v3 wire protocol over a real TCP socket. The frames
the fake server streams are produced by this repo's own pgoutput
ENCODERS, so the test closes the loop: encode → wire (XLogData/CopyBoth
framing, MD5 auth, keepalive/ack) → client dump → parquet → Spark
decode → applied state."""

from __future__ import annotations

import datetime as dt
import hashlib
import socket
import struct
import threading

import pytest

from python_cdc_spark.cdc.pgoutput import (
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
)
from python_cdc_spark.cdc.replication_client import (
    PG_EPOCH_OFFSET_US,
    LogicalReplicationClient,
    ReplicationError,
    lsn_str,
    parse_lsn,
)

USERS_COLS = ["id", "name", "status"]


def _msg(mtype: bytes, payload: bytes = b"") -> bytes:
    return mtype + struct.pack(">i", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _xlogdata(lsn: int, frame: bytes) -> bytes:
    send_us = 1_700_000_000_000_000 - PG_EPOCH_OFFSET_US
    return _msg(b"d", b"w" + struct.pack(">QQQ", lsn, lsn, send_us) + frame)


def _datarow(*vals: str) -> bytes:
    body = struct.pack(">h", len(vals))
    for v in vals:
        b = v.encode()
        body += struct.pack(">i", len(b)) + b
    return _msg(b"D", body)


class FakePG(threading.Thread):
    """Scripted backend: MD5 auth, IDENTIFY_SYSTEM, slot creation (and
    the duplicate-slot error), then a CopyBoth stream of pgoutput frames
    with a reply-requested keepalive in the middle."""

    def __init__(self, frames: list[tuple[int, bytes]], password: str):
        super().__init__(daemon=True)
        self.frames = frames
        self.password = password
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.seen: dict = {}
        self.error: str | None = None

    # -- helpers ----------------------------------------------------------

    def _recv_exact(self, c: socket.socket, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = c.recv(n - len(out))
            if not chunk:
                raise ConnectionError("client closed")
            out += chunk
        return out

    def _read_typed(self, c: socket.socket) -> tuple[bytes, bytes]:
        t = self._recv_exact(c, 1)
        (ln,) = struct.unpack(">i", self._recv_exact(c, 4))
        return t, self._recv_exact(c, ln - 4)

    def _ready(self, c: socket.socket) -> None:
        c.sendall(_msg(b"Z", b"I"))

    # -- the script -------------------------------------------------------

    def run(self) -> None:  # pragma: no cover - assertions re-raised in test
        try:
            self._run()
        except Exception as e:  # surface thread failures to the test
            self.error = f"{type(e).__name__}: {e}"

    def _run(self) -> None:
        c, _ = self.srv.accept()
        c.settimeout(30)
        # startup: untyped message (len + proto + params)
        (ln,) = struct.unpack(">i", self._recv_exact(c, 4))
        payload = self._recv_exact(c, ln - 4)
        (proto,) = struct.unpack(">i", payload[:4])
        assert proto == 196608
        kv = payload[4:].split(b"\x00")
        params = dict(zip(kv[0::2], kv[1::2]))
        self.seen["startup"] = {k.decode(): v.decode() for k, v in params.items() if k}
        assert self.seen["startup"].get("replication") == "database"
        user = self.seen["startup"]["user"]

        # MD5 auth round-trip
        salt = b"\x01\x02\x03\x04"
        c.sendall(_msg(b"R", struct.pack(">i", 5) + salt))
        t, pw_payload = self._read_typed(c)
        assert t == b"p"
        inner = hashlib.md5((self.password + user).encode()).hexdigest()
        expect = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
        assert pw_payload.rstrip(b"\x00").decode() == expect, "md5 digest mismatch"
        c.sendall(_msg(b"R", struct.pack(">i", 0)))
        c.sendall(_msg(b"S", _cstr("server_version") + _cstr("16.0")))
        self._ready(c)

        slot_created = False
        while True:
            t, q = self._read_typed(c)
            if t != b"Q":
                continue
            sql = q.rstrip(b"\x00").decode()
            self.seen.setdefault("queries", []).append(sql)
            if sql == "IDENTIFY_SYSTEM":
                c.sendall(_datarow("7000", "1", "0/1000000", "testdb"))
                c.sendall(_msg(b"C", _cstr("IDENTIFY_SYSTEM")))
                self._ready(c)
            elif sql.startswith("CREATE_REPLICATION_SLOT"):
                if slot_created:
                    c.sendall(
                        _msg(
                            b"E",
                            b"S" + _cstr("ERROR") + b"C" + _cstr("42710")
                            + b"M" + _cstr("replication slot already exists")
                            + b"\x00",
                        )
                    )
                    self._ready(c)
                else:
                    slot_created = True
                    c.sendall(_datarow("cdc_slot", "0/1000000", "snap", "pgoutput"))
                    c.sendall(_msg(b"C", _cstr("CREATE_REPLICATION_SLOT")))
                    self._ready(c)
            elif sql.startswith("START_REPLICATION"):
                break
        # CopyBothResponse, then the stream
        c.sendall(_msg(b"W", struct.pack(">bh", 0, 0)))
        half = len(self.frames) // 2
        for lsn, frame in self.frames[:half]:
            c.sendall(_xlogdata(lsn, frame))
        # keepalive demanding a reply; client must report flushed lsn
        ka_ts = 1_700_000_000_000_000 - PG_EPOCH_OFFSET_US
        c.sendall(_msg(b"d", b"k" + struct.pack(">QQ", 0, ka_ts) + b"\x01"))
        t, status = self._read_typed(c)
        assert t == b"d" and status[:1] == b"r"
        written, flushed, applied, _ts, _rep = struct.unpack(">QQQQB", status[1:])
        self.seen["flushed_at_keepalive"] = flushed
        for lsn, frame in self.frames[half:]:
            c.sendall(_xlogdata(lsn, frame))
        c.sendall(_msg(b"c"))  # CopyDone
        c.sendall(_msg(b"C", _cstr("COPY 0")))
        self._ready(c)
        # drain trailing client messages (post-batch acks) until close
        c.settimeout(5)
        try:
            while c.recv(4096):
                pass
        except (TimeoutError, OSError):
            pass
        c.close()
        self.srv.close()


def _demo_frames() -> list[tuple[int, bytes]]:
    relid = 16385
    return [
        (10, encode_relation(relid, "public", "users", USERS_COLS)),
        (11, encode_insert(relid, ["1", "Ada", "active"])),
        (12, encode_insert(relid, ["2", "Lin", "active"])),
        (13, encode_update(relid, ["1", "Ada L", "inactive"], old_values=["1"], key_only=True)),
        (14, encode_delete(relid, ["2", None, None], key_only=True)),
    ]


def test_lsn_roundtrip():
    for v in (0, 1, 0x16B3748, (7 << 32) | 0xDEADBEEF):
        assert parse_lsn(lsn_str(v)) == v


def test_replication_client_socket_to_state(spark, tmp_path):
    """Full live path: MD5 auth → slot commands → CopyBoth stream →
    keepalive ack carries the flushed LSN → parquet dump → Spark decode
    → applied state equals the reference demo sequence's outcome."""
    import pyspark.sql.functions as SF

    from python_cdc_spark.cdc.apply import apply_changes
    from python_cdc_spark.cdc.pgoutput import decode_frames, relation_registry

    frames = _demo_frames()
    srv = FakePG(frames, password="sekret")
    srv.start()

    out_dir = str(tmp_path / "wire")
    with LogicalReplicationClient(
        "127.0.0.1", srv.port, "testdb", "cdc_user", "sekret"
    ) as client:
        ident = client.identify_system()
        assert ident["dbname"] == "testdb" and ident["xlogpos"] == parse_lsn("0/1000000")
        assert client.create_slot("cdc_slot")["slot"] == "cdc_slot"
        assert client.create_slot("cdc_slot") is None  # duplicate tolerated
        client.start_replication("cdc_slot", publication="cdc_publication")
        n = client.dump_parquet(out_dir, max_seconds=30)
    srv.join(timeout=30)
    assert srv.error is None, srv.error
    assert n == len(frames)
    # the mid-stream keepalive saw the first half's max lsn as flushed
    assert srv.seen["flushed_at_keepalive"] == frames[len(frames) // 2 - 1][0]
    assert any(
        q.startswith("START_REPLICATION SLOT cdc_slot LOGICAL")
        and "publication_names 'cdc_publication'" in q
        for q in srv.seen["queries"]
    )

    # wire parquet → decode → apply: the state a reference user ends with
    feed = spark.read.parquet(out_dir)
    assert feed.count() == len(frames)
    reg = relation_registry(feed)
    assert reg[16385]["columns"] == USERS_COLS
    events = decode_frames(spark, feed, registry=reg).withColumn(
        "key", SF.coalesce(SF.col("new_values")["id"], SF.col("old_values")["id"])
    )
    state = apply_changes(events, "key")
    got = {r["key"]: dict(r["values"]) for r in state.collect()}
    assert got == {"1": {"id": "1", "name": "Ada L", "status": "inactive"}}


def test_live_capture_streaming_apply_with_health(spark, tmp_path):
    """The reference's whole main program, live: wire capture, streaming
    decode+apply, and the HTTP health endpoint all running AT THE SAME
    TIME. The client dumps small parquet batches while the fake server
    streams; Spark tails the directory as a stream and applies changes
    continuously; /health answers 200 while the query runs. Final state
    equals the demo sequence's outcome."""
    import time as _time
    import urllib.request

    import pyspark.sql.functions as SF

    from python_cdc_spark.cdc.monitor import HealthServer
    from python_cdc_spark.cdc.pgoutput import decode_frames, relation_registry
    from python_cdc_spark.streaming import StreamingApplyChanges

    frames = _demo_frames()
    srv = FakePG(frames, password="sekret")
    srv.start()
    wire = tmp_path / "wire"
    wire.mkdir()

    captured = {}

    def capture() -> None:
        with LogicalReplicationClient(
            "127.0.0.1", srv.port, "testdb", "cdc_user", "sekret"
        ) as client:
            client.create_slot("cdc_slot")
            client.start_replication("cdc_slot", publication="cdc_publication")
            # batch_rows=2 → several files appear over the stream's life
            captured["n"] = client.dump_parquet(
                str(wire), batch_rows=2, max_seconds=30
            )

    cap = threading.Thread(target=capture, daemon=True)
    cap.start()

    # wait for the first batch file (contains the Relation frame — it
    # always precedes its rows in a pgoutput stream)
    deadline = _time.monotonic() + 30
    while not list(wire.glob("*.parquet")) and _time.monotonic() < deadline:
        _time.sleep(0.1)
    assert list(wire.glob("*.parquet")), "no wire batches appeared"

    reg = relation_registry(spark.read.parquet(str(wire)))
    stream = spark.readStream.schema("lsn bigint, ts timestamp, frame binary").parquet(
        str(wire)
    )
    events = decode_frames(spark, stream, registry=reg).withColumn(
        "key", SF.coalesce(SF.col("new_values")["id"], SF.col("old_values")["id"])
    )
    applier = StreamingApplyChanges(spark, str(tmp_path / "state"), "key", n_buckets=4)
    q = applier.start(events, str(tmp_path / "ckpt"))
    try:
        with HealthServer(spark, q, port=0) as hs:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{hs.port}/health", timeout=10
            ) as resp:
                assert resp.status == 200
            expected = {"1": {"id": "1", "name": "Ada L", "status": "inactive"}}
            deadline = _time.monotonic() + 60
            got: dict = {}
            while _time.monotonic() < deadline:
                got = {
                    r["key"]: dict(r["values"])
                    for r in applier.current_state().collect()
                }
                if got == expected:
                    break
                _time.sleep(0.5)
            assert got == expected, f"state never converged: {got}"
    finally:
        q.stop()
        q.awaitTermination(60)
    cap.join(timeout=30)
    srv.join(timeout=30)
    assert srv.error is None, srv.error
    assert captured["n"] == len(frames)


def test_replication_client_rejects_scram():
    """SCRAM (auth code 10) is out of scope — the client must fail with
    a clear message, not hang or mis-auth."""
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def fake():
        c, _ = srv.accept()
        ln = struct.unpack(">i", c.recv(4))[0]
        c.recv(ln - 4)
        c.sendall(_msg(b"R", struct.pack(">i", 10) + _cstr("SCRAM-SHA-256")))
        c.close()
        srv.close()

    t = threading.Thread(target=fake, daemon=True)
    t.start()
    client = LogicalReplicationClient("127.0.0.1", port, "db", "u", "pw")
    with pytest.raises(ReplicationError, match="unsupported auth"):
        client.connect()
    client.close()
