"""Filesystem primitives for the CDC-maintained structures.

The four maintained structures (rollup cube, ANN inverted lists, dedup
index, BM25 text index), the bucketed state store, and the unified
vacuum layer all share one durability shape: immutable version
directories published by an atomic pointer rename. This module is the
ONLY place they touch the filesystem for that shape — list / atomic
replace / recursive delete / pointer publish / size accounting — so a
transactional backend (object store + a real table format, or a
metadata service) is a port of ONE module, not a grep across five
(r10/r11 verdicts' "fs-helper seam").

Semantics the callers rely on:

- ``replace`` is ATOMIC on the backing store (POSIX rename here; an
  object-store backend must substitute a conditional-put or
  metadata-service swap — this is the single primitive every
  structure's commit point uses).
- ``publish_json`` = write sidecar + fsync + ``replace``: a crash at
  any point leaves either the old pointer or the new one, never a
  torn file.
- ``remove_tree`` / ``remove_file`` are idempotent (missing target is
  a no-op): vacuum and post-publish cleanup retry safely.
- ``list_dir`` of a missing directory is ``[]``: callers enumerate
  optional subtrees without existence preflights.

LOCAL paths. Writes were single-writer by constraint through r12; r13
adds OPTIMISTIC CONCURRENCY at the pointer swap (``cas_publish`` +
``read_json_with_token``): a writer records the committed pointer's
identity token when it reads, stages freely (staged dirs are invisible
until published), and commits only if the token is unchanged — the
local-FS analog of an object-store conditional-put / ETag
if-match. Two racing writers: exactly one wins; the loser raises
:class:`ConcurrentWriterError` with its staged dirs unreferenced (the
next vacuum reclaims them) and retries from a fresh read or refuses.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class ConcurrentWriterError(RuntimeError):
    """Another writer moved the pointer (or holds the publish lock)
    between this writer's read and its publish. The structure on disk
    is whatever the WINNER committed — nothing is torn; the caller
    re-reads and retries, or surfaces the conflict."""


def list_dir(path: str) -> list[str]:
    """Directory entries (names, not paths); [] when missing."""
    try:
        return os.listdir(path)
    except (FileNotFoundError, NotADirectoryError):
        return []


def is_dir(path: str) -> bool:
    return os.path.isdir(path)


def is_file(path: str) -> bool:
    return os.path.isfile(path)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def replace(src: str, dst: str) -> None:
    """Atomic rename — the commit primitive for every pointer swap and
    staged-directory publish."""
    os.replace(src, dst)


def rename_no_clobber(src: str, dst: str) -> bool:
    """Atomic rename that REFUSES to replace an occupied destination:
    returns False when ``dst`` exists non-empty (POSIX rename fails
    ENOTEMPTY/EEXIST for that case), True when the rename landed. The
    claim primitive for versioned-slot staging: two racing writers can
    never steal each other's staged or committed directories — the one
    that finds a slot occupied claims the next version instead, and any
    slot the losing pointer never references is vacuum fodder.

    (An EMPTY existing directory is silently replaced — structures here
    only ever produce populated dirs, and rename into a populated dir
    is what must never succeed.)"""
    import errno

    try:
        os.rename(src, dst)
        return True
    except OSError as e:
        if e.errno in (errno.ENOTEMPTY, errno.EEXIST, errno.EISDIR, errno.ENOTDIR):
            return False
        raise


#: how old a writer-private staging dir must be before cleanup/vacuum
#: may presume its writer dead and reclaim it. Staging normally lives
#: seconds-to-minutes; a CONCURRENT writer's active staging must never
#: be swept out from under its in-flight Spark write.
STAGING_TTL_SECS = 3600.0


def staging_is_stale(path: str, ttl: float = STAGING_TTL_SECS) -> bool:
    """True when a staging directory is old enough to reclaim (its
    writer crashed or lost long ago); False for missing paths and for
    young dirs that may belong to a live concurrent writer."""
    try:
        return (time.time() - os.path.getmtime(path)) > ttl
    except OSError:
        return False


def remove_tree(path: str) -> None:
    """Recursive delete; missing target is a no-op."""
    shutil.rmtree(path, ignore_errors=True)


def remove_file(path: str) -> None:
    """Unlink; missing target is a no-op."""
    try:
        os.remove(path)
    except OSError:
        pass


def publish_json(path: str, obj: dict) -> None:
    """Crash-atomic JSON pointer publish: temp write + fsync + rename."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
        fh.flush()
        os.fsync(fh.fileno())
    replace(tmp, path)


def read_json(path: str, default=None):
    """Parsed JSON, or ``default`` when missing/torn (a torn file can
    only be a ``.tmp`` never renamed — the committed pointer is intact)."""
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return default


def file_token(path: str):
    """Opaque identity token of a committed pointer file — the local-FS
    ETag: ``(inode, mtime_ns, size)``, or None when the file does not
    exist. Every ``publish_json``/``replace`` installs a NEW inode (the
    temp file's), so any successful publish changes the token even if
    it writes byte-identical content."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    return (st.st_ino, st.st_mtime_ns, st.st_size)


def read_json_with_token(path: str, default=None):
    """``(parsed JSON or default, identity token)`` with a
    stat/read/re-stat loop, so the returned token is guaranteed to
    identify exactly the bytes parsed — the read half of the
    optimistic-concurrency protocol (pass the token to
    ``cas_publish`` as ``expected_token``)."""
    while True:
        t0 = file_token(path)
        obj = read_json(path, default)
        if file_token(path) == t0:
            return obj, t0


def cas_publish(
    path: str, obj, expected_token, stale_lock_secs: float = 60.0
) -> None:
    """Conditional pointer publish (compare-and-swap): commit ``obj``
    at ``path`` only if the committed file's identity token still
    equals ``expected_token`` (None = "must not exist yet"). Raises
    :class:`ConcurrentWriterError` when the precondition fails or
    another writer holds the publish lock — the losing writer's staged
    version directories stay unreferenced and the next vacuum reclaims
    them, so losing is always safe.

    Mutual exclusion between check and rename comes from an
    ``O_CREAT|O_EXCL`` lock file (atomic on POSIX); the lock is held
    only across stat + json dump + rename (milliseconds). A lock older
    than ``stale_lock_secs`` is presumed crashed mid-publish and
    broken — the crashed writer never renamed, so the committed
    pointer is intact and the token check still decides.

    An object-store backend replaces this whole function with the
    store's native conditional-put (S3 If-Match / GCS
    ifGenerationMatch) — same contract, no lock file."""
    lock = path + ".lock"
    fd = None
    for attempt in (0, 1):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                age = 0.0  # lock vanished: raced its release — contended
            if age <= stale_lock_secs or attempt == 1:
                raise ConcurrentWriterError(
                    f"another writer holds the publish lock for {path}"
                )
            remove_file(lock)  # stale: its owner crashed before renaming
    try:
        if file_token(path) != expected_token:
            raise ConcurrentWriterError(
                f"pointer {path} moved since this writer read it "
                f"(lost the publish race)"
            )
        publish_json(path, obj)
    finally:
        if fd is not None:
            os.close(fd)
        remove_file(lock)


def write_marker(path: str, content: str = "") -> None:
    """Commit marker (e.g. ``_COMMITTED``): atomic create-with-content
    via temp + rename, so a reader never sees a half-written marker."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(content)
        fh.flush()
        os.fsync(fh.fileno())
    replace(tmp, path)


def tree_bytes(path: str) -> int:
    """Total bytes under a directory, or the file's own size — vacuum
    receipts' reclaimed-space accounting."""
    if os.path.isfile(path):
        try:
            return os.path.getsize(path)
        except OSError:
            return 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total
