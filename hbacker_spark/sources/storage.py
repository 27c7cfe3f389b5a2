"""Multi-scheme artifact I/O — S11/S12 via the Hadoop FileSystem API.

The reference dispatches on URI scheme by hand (s3/s3n → RightAws PUT,
file → mkdir_p+write, hdfs → local shadow dir with a warning;
lib/hbacker/s3.rb:60-78). Spark's Hadoop layer already resolves
``file://``, ``hdfs://``, ``s3a://`` (with the right jars) uniformly, so
one code path covers every scheme — on a real cluster the same call
writes to S3/HDFS with no code change.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from datetime import datetime, timezone

from pyspark.sql import SparkSession

# In-process claim serializer for path_fence: Hadoop's
# FileSystem.createNewFile is check-then-act on LocalFileSystem (the
# default impl is exists() then create(), and the local create
# truncates instead of failing on a lost race), so two THREADS of one
# driver could both "win" the same lockfile. One mutex around the claim
# attempt makes in-process claims atomic; it is held only for the
# claim, never across the fenced work, so waiters still sleep-poll.
# Cross-PROCESS atomicity comes from the filesystem: local paths claim
# via kernel-atomic os.O_EXCL (create_new_file dispatches on the
# resolved scheme), HDFS via the namenode-atomic createNewFile; S3A has
# no compare-and-set, so there the fence is advisory — single-writer by
# deployment contract (catalog module docstring).
_CLAIM_MUTEX = threading.Lock()


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def join_path(root: str, *parts: str) -> str:
    """URI-safe path join: works for both plain POSIX roots and
    scheme-qualified roots (``file://``, ``hdfs://``, ``s3a://``,
    ``viewfs://``) — ``os.path.join`` is wrong for the latter on
    Windows-style separators and never right for URIs."""
    out = root.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, hpath = _fs_and_path(spark, path)
    fs.mkdirs(hpath)


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Rename ``src`` to ``dst`` on any scheme. Refuses an existing
    destination FIRST: Hadoop's ``rename(src, existing_dir)`` silently
    moves src INTO the directory (POSIX ``mv`` semantics) — the exact
    corruption a swap pattern must never produce. Raises on failure
    (Hadoop signals failure by returning false, not raising)."""
    fs, hsrc = _fs_and_path(spark, src)
    _, hdst = _fs_and_path(spark, dst)
    if fs.exists(hdst):
        raise RuntimeError(f"rename destination already exists: {dst}")
    if not fs.rename(hsrc, hdst):
        raise RuntimeError(f"rename failed: {src} -> {dst}")


def create_new_file(spark: SparkSession, path: str) -> bool:
    """Atomic create-if-absent: True if this caller created the file,
    False if it already existed.

    Scheme dispatch matters here (r10 review finding): Hadoop's
    ``FileSystem.createNewFile`` is exists()-then-create() on
    LocalFileSystem — and the local create TRUNCATES on a lost race —
    so the pre-port ``O_EXCL`` cross-process guarantee would silently
    become advisory on local disks. Paths that RESOLVE to the local
    scheme (including through a viewfs mount) therefore claim with
    ``os.O_EXCL`` (kernel-atomic); everything else uses
    ``createNewFile``, which is namenode-atomic on HDFS. S3A has no
    atomic create-if-absent at all (no compare-and-set), so fences
    there are advisory — the documented single-writer caveat."""
    fs, hpath = _fs_and_path(spark, path)
    parent = hpath.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    try:
        # resolve through mounts (viewfs) via the existing parent; the
        # lock file itself does not exist yet
        resolved_parent = fs.resolvePath(parent).toUri()
    except Exception:  # noqa: BLE001 — FS without resolvePath support
        resolved_parent = fs.makeQualified(parent).toUri()
    if resolved_parent.getScheme() in (None, "file"):
        local = os.path.join(resolved_parent.getPath(), hpath.getName())
        try:
            os.close(os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            return True
        except FileExistsError:
            return False
    return bool(fs.createNewFile(hpath))


@contextmanager
def path_fence(
    spark: SparkSession,
    lock_path: str,
    wait_s: float = 0.0,
    poll_s: float = 0.25,
    error: type[Exception] = RuntimeError,
    what: str = "path",
):
    """Single-writer fence on any Hadoop scheme — the catalog's O_EXCL
    lockfile generalized (VERDICT r9 #1): ``createNewFile`` is the
    atomic claim, holder info (pid + timestamp) is written after the
    claim so a crashed holder is diagnosable. ``wait_s=0`` raises
    ``error`` immediately on contention; ``wait_s>0`` sleep-polls (never
    busy-waits) up to the bound, then raises. Lock released on exit,
    success or failure. S3A caveat: see :func:`create_new_file`."""
    deadline = time.monotonic() + max(0.0, wait_s)

    def claim() -> bool:
        with _CLAIM_MUTEX:  # thread-atomic; see module note
            return create_new_file(spark, lock_path)

    while not claim():
        if time.monotonic() < deadline:
            time.sleep(poll_s)
            continue
        try:
            holder = read_info(spark, lock_path).strip()
        except Exception:  # noqa: BLE001 — holder info is best-effort
            holder = "<unreadable>"
        raise error(
            f"concurrent update on {what}: lock {lock_path} is held by "
            f"{holder}. This resource is single-writer by contract; "
            f"retry with a bounded wait or, if the holder crashed, "
            f"remove the lockfile."
        )
    try:
        now = datetime.now(timezone.utc).replace(tzinfo=None).isoformat()
        try:  # we own the lock; stamping it is best-effort
            save_info(spark, lock_path, f"pid={os.getpid()} at={now}")
        except Exception:  # noqa: BLE001
            pass
        yield
    finally:
        try:
            delete_path(spark, lock_path, recursive=False)
        except Exception:  # noqa: BLE001
            pass


def _recursive_file_stats(spark: SparkSession, path: str) -> tuple[int, int, set[str]]:
    """One recursive ``listFiles`` pass: (total bytes, parquet file
    count, parquet-holding leaf dirs) — the shared walker behind the
    sizing and fragmentation views (scheme-agnostic; an os.walk here
    would pin maintenance to the driver's local disk)."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return 0, 0, set()
    total = n_parquet = 0
    dirs: set[str] = set()
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        total += int(status.getLen())
        if status.getPath().getName().endswith(".parquet"):
            n_parquet += 1
            dirs.add(status.getPath().getParent().toString())
    return total, n_parquet, dirs


def dir_bytes_and_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total bytes, parquet file count) under ``path`` — the sizing
    input for compaction planning."""
    total, n_parquet, _ = _recursive_file_stats(spark, path)
    return total, n_parquet


def swap_dir(
    spark: SparkSession, tmp: str, path: str, bak: str, allow_missing_old: bool = False
) -> None:
    """The atomic cutover shared by every maintenance rewrite: move the
    live dir to ``bak``, the freshly-written ``tmp`` into place, then
    drop ``bak``. Scheme-agnostic; each rename is atomic on the
    filesystems that have atomic rename (local, HDFS).
    ``allow_missing_old`` handles first-write call sites (catalog
    overwrite of a not-yet-created table, first geometry write)."""
    had_old = exists(spark, path) if allow_missing_old else True
    if had_old:
        rename(spark, path, bak)
    rename(spark, tmp, path)
    if had_old:
        delete_path(spark, bak)


def leaf_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(leaf partition directories, parquet data files) under ``path``
    — the fragmentation view for index/catalog maintenance cadence."""
    _, n_parquet, dirs = _recursive_file_stats(spark, path)
    return len(dirs), n_parquet


def save_info(spark: SparkSession, full_path: str, data: str) -> None:
    """S11 (s3.rb:60-78): write a small artifact (job log, marker) to any
    scheme the Hadoop conf resolves. Parent dirs are created implicitly."""
    save_bytes(spark, full_path, data.encode("utf-8"))


def save_bytes(spark: SparkSession, full_path: str, data: bytes) -> None:
    """Write a small binary artifact through the Hadoop FS stream (any
    scheme, parents created implicitly) — the driver-side fast path for
    metadata-sized files where a Spark write job would be all overhead
    (e.g. the catalog's single-row parquet appends)."""
    fs, hpath = _fs_and_path(spark, full_path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_info(spark: SparkSession, full_path: str) -> str:
    fs, hpath = _fs_and_path(spark, full_path)
    stream = fs.open(hpath)
    try:
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def list_path(spark: SparkSession, path: str) -> list[dict]:
    """S12 (s3.rb:38-48): one-level listing — files and "common prefixes"
    (subdirectories), like a delimiter='/' object-store listing."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        out.append(
            {
                "name": status.getPath().getName(),
                "is_dir": bool(status.isDirectory()),
                "size": int(status.getLen()),
            }
        )
    return sorted(out, key=lambda d: d["name"])


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def delete_path(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Remove a path (any scheme). Used to clear partial output before a
    transient-failure retry; returns False if the path did not exist."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, recursive))
