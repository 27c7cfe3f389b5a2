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
import re
import threading
import time
import warnings
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

# Schemes with a real atomic create-if-absent: local (kernel O_EXCL),
# HDFS-class (namenode-atomic createNewFile). Anything else — s3a/s3/
# gs/wasb/abfs object stores — is check-then-act, so a fence claimed
# there is ADVISORY and the operator must know (ADVICE r10, medium):
# create_new_file emits a one-time warning per scheme instead of
# letting the degradation surface as silent lost updates.
ATOMIC_CREATE_SCHEMES = frozenset({None, "file", "hdfs", "webhdfs", "viewfs"})
_WARNED_SCHEMES: set[str] = set()


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
    scheme = resolved_parent.getScheme()
    if scheme in (None, "file"):
        local = os.path.join(resolved_parent.getPath(), hpath.getName())
        try:
            os.close(os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            return True
        except FileExistsError:
            return False
    if scheme not in ATOMIC_CREATE_SCHEMES and scheme not in _WARNED_SCHEMES:
        # one-time runtime signal (ADVICE r10, medium): on object stores
        # the claim below is exists()-then-create(), so the single-writer
        # fence is advisory — say so loudly ONCE instead of letting two
        # "winning" writers discover it via silent lost updates.
        _WARNED_SCHEMES.add(scheme)
        warnings.warn(
            f"filesystem scheme {scheme!r} has no atomic create-if-absent: "
            f"single-writer fences on it are ADVISORY (check-then-act). "
            f"Serialize writers externally, or keep mutation roots on an "
            f"HDFS-class filesystem. (Reads are unaffected: readers "
            f"resolve committed versions and never take the fence.)",
            RuntimeWarning,
            stacklevel=2,
        )
    return bool(fs.createNewFile(hpath))


def _holder_age_s(holder: str) -> float | None:
    """Age of a fence holder stamp (``pid=N at=ISO``) in seconds, None
    when the stamp is unreadable/not-yet-written."""
    m = re.search(r"at=(\S+)", holder)
    if not m:
        return None
    try:
        then = datetime.fromisoformat(m.group(1))
    except ValueError:
        return None
    return (datetime.now(timezone.utc).replace(tzinfo=None) - then).total_seconds()


@contextmanager
def path_fence(
    spark: SparkSession,
    lock_path: str,
    wait_s: float = 0.0,
    poll_s: float = 0.25,
    error: type[Exception] = RuntimeError,
    what: str = "path",
    stale_ttl_s: float | None = None,
):
    """Single-writer fence on any Hadoop scheme — the catalog's O_EXCL
    lockfile generalized (VERDICT r9 #1): ``createNewFile`` is the
    atomic claim, holder info (pid + timestamp) is written after the
    claim so a crashed holder is diagnosable. ``wait_s=0`` raises
    ``error`` immediately on contention; ``wait_s>0`` sleep-polls (never
    busy-waits) up to the bound, then raises — the error includes the
    lock's AGE so a crashed holder is distinguishable from a live one
    at a glance (ADVICE r10). Lock released on exit, success or failure.

    ``stale_ttl_s`` (opt-in; default from env
    ``SPARK_GRAFT_FENCE_STALE_TTL_S``) enables crashed-holder takeover:
    a lock whose holder stamp is older than the TTL is deleted and
    re-claimed through the normal atomic claim (with a warning).
    Takeover is for CRASHED holders, not contention — size the TTL well
    past the longest legitimate fence hold (a rebuild), and prefer one
    designated recovery agent: two waiters passing the TTL together can
    delete/claim in an order where both win (the delete+create pair is
    not CAS). Without a TTL a crashed holder blocks writers until an
    operator removes the lockfile — the conservative default.
    S3A caveat: see :func:`create_new_file`."""
    if stale_ttl_s is None:
        env = os.environ.get("SPARK_GRAFT_FENCE_STALE_TTL_S")
        stale_ttl_s = float(env) if env else None
    deadline = time.monotonic() + max(0.0, wait_s)

    def claim() -> bool:
        with _CLAIM_MUTEX:  # thread-atomic; see module note
            return create_new_file(spark, lock_path)

    def read_holder() -> tuple[str, float | None]:
        try:
            h = read_info(spark, lock_path).strip()
        except Exception:  # noqa: BLE001 — holder info is best-effort
            h = "<unreadable>"
        age = _holder_age_s(h)
        if age is None:
            # stamp-less lock: the holder crashed BETWEEN the atomic
            # claim and writing its pid/timestamp stamp — exactly the
            # crash class the TTL exists for (r11 review), so fall back
            # to the lockfile's own modification time for the age
            try:
                fs, hpath = _fs_and_path(spark, lock_path)
                mtime_ms = fs.getFileStatus(hpath).getModificationTime()
                age = max(0.0, time.time() - mtime_ms / 1000.0)
            except Exception:  # noqa: BLE001 — lock vanished mid-probe
                age = None
        return h, age

    while not claim():
        if stale_ttl_s is not None:
            holder, age = read_holder()
            if age is not None and age > stale_ttl_s:
                warnings.warn(
                    f"fence takeover on {what}: lock {lock_path} held by "
                    f"{holder} is {age:.0f}s old (> stale TTL "
                    f"{stale_ttl_s:.0f}s) — assuming a crashed holder and "
                    f"re-claiming.",
                    RuntimeWarning,
                    stacklevel=2,
                )
                delete_path(spark, lock_path, recursive=False)
                continue  # back to the atomic claim — only one taker wins it
        if time.monotonic() < deadline:
            time.sleep(poll_s)
            continue
        holder, age = read_holder()
        age_txt = f"{age:.0f}s old" if age is not None else "age unknown"
        raise error(
            f"concurrent update on {what}: lock {lock_path} ({age_txt}) is "
            f"held by {holder}. This resource is single-writer by contract; "
            f"retry with a bounded wait or, if the holder crashed, "
            f"remove the lockfile (or set SPARK_GRAFT_FENCE_STALE_TTL_S "
            f"for automatic stale-lock takeover)."
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


# ---------------------------------------------------------------------------
# Versioned directories (VERDICT r10 #1): wait-free reads on ANY scheme.
#
# The delete-then-rename swap (swap_dir) is atomic per rename on
# local/HDFS, but (a) it has a window where the live path does not
# exist — a concurrent reader gets FileNotFound — and (b) on object
# stores rename is copy+delete, widening that window to seconds. The
# versioned layout removes the window structurally: data lives in
# monotonically numbered subdirs (``v000000/``, ``v000001/``, …) and a
# version becomes CURRENT when its commit marker (``_v000001.commit``)
# appears — one small-file create, the closest thing every filesystem
# (including S3) has to an atomic publish. Readers list the dir once,
# pick the highest committed version, and read files that writers never
# delete until a NEWER version has committed (keep_previous grace) —
# so a read that resolved just before a swap still completes. Writers
# never rename over live data and never leave a moment with no
# committed version.
#
# S3A semantics of the marker write: a PUT of a new key is atomic in
# visibility (S3 is strongly read-after-write consistent since 2020),
# so readers see either no marker or the whole marker — the commit
# itself is safe on object stores. What stays advisory on S3A is the
# WRITER fence (no atomic create-if-absent, see create_new_file): two
# concurrent writers can both commit, in which case the higher version
# number wins and the loser's version is retired at the next commit —
# lost update, loud in version history, never a torn read.
#
# Legacy layout (pre-r11 data directly in ``path``): resolve falls back
# to ``path`` itself when no committed version exists; the first
# versioned commit keeps the legacy files as the grace "previous
# version" and the second commit retires them (migration needs no
# offline step).
# ---------------------------------------------------------------------------

_VERSION_RE = re.compile(r"^v(\d{6})$")
_COMMIT_RE = re.compile(r"^_v(\d{6})\.commit$")


def version_dir(path: str, n: int) -> str:
    return join_path(path, f"v{n:06d}")


def committed_versions(spark: SparkSession, path: str) -> list[int]:
    """Sorted committed version numbers under ``path`` (marker AND data
    dir both present — a marker whose dir was half-retired is ignored,
    a dir without a marker is an uncommitted writer/debris)."""
    names = {e["name"] for e in list_path(spark, path)}
    out = []
    for name in names:
        m = _COMMIT_RE.match(name)
        if m and f"v{int(m.group(1)):06d}" in names:
            out.append(int(m.group(1)))
    return sorted(out)


def resolve_data_dir(spark: SparkSession, path: str) -> str:
    """Where the CURRENT data of ``path`` lives: the highest committed
    version dir, or ``path`` itself for legacy/empty layouts. One
    listing, no exceptions — the wait-free read entry point."""
    vs = committed_versions(spark, path)
    return version_dir(path, vs[-1]) if vs else path


def begin_version(spark: SparkSession, path: str) -> tuple[int, str]:
    """Reserve the next version number: max over every version dir or
    marker present (committed or not) + 1. Caller must hold the
    single-writer fence for ``path``; the dir is not created here —
    the caller's write job creates it."""
    nums = [-1]
    for e in list_path(spark, path):
        m = _VERSION_RE.match(e["name"]) or _COMMIT_RE.match(e["name"])
        if m:
            nums.append(int(m.group(1)))
    n = max(nums) + 1
    return n, version_dir(path, n)


def commit_version(
    spark: SparkSession, path: str, n: int, keep_previous: int = 1
) -> None:
    """Publish version ``n`` (write its commit marker) and retire what
    the grace window no longer needs: committed versions below ``n``
    beyond the newest ``keep_previous``, uncommitted debris dirs below
    ``n`` (crashed writers — safe to drop, the caller holds the fence),
    and legacy root files once ``keep_previous`` committed versions
    already stand below ``n`` (until then the legacy files ARE the
    grace copy). Markers are deleted before their dirs so a reader
    listing mid-retire never resolves to a half-deleted version."""
    stamp = (
        f"pid={os.getpid()} "
        f"at={datetime.now(timezone.utc).replace(tzinfo=None).isoformat()}"
    )
    save_info(spark, join_path(path, f"_v{n:06d}.commit"), stamp)
    entries = list_path(spark, path)
    committed_below = [
        int(m.group(1))
        for e in entries
        if (m := _COMMIT_RE.match(e["name"])) and int(m.group(1)) < n
    ]
    keep = set(sorted(committed_below)[-keep_previous:]) if keep_previous else set()
    # pass 1: stale markers (so no version is ever committed-but-gone)
    for e in entries:
        m = _COMMIT_RE.match(e["name"])
        if m and int(m.group(1)) < n and int(m.group(1)) not in keep:
            delete_path(spark, join_path(path, e["name"]), recursive=False)
    # pass 2: stale/debris version dirs, then legacy root entries
    legacy_retirable = len(committed_below) >= keep_previous
    for e in entries:
        m = _VERSION_RE.match(e["name"])
        if m:
            if int(m.group(1)) < n and int(m.group(1)) not in keep:
                delete_path(spark, join_path(path, e["name"]))
        elif not _COMMIT_RE.match(e["name"]) and legacy_retirable:
            delete_path(spark, join_path(path, e["name"]))


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
