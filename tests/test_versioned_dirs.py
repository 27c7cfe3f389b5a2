"""Versioned-directory commit layer (VERDICT r10 #1).

What these pin (sources/storage.py, "Versioned directories"):
- resolve → highest committed version; a dir without its marker (a
  crashed writer) is invisible; legacy layouts resolve to the path
  itself so pre-r11 data needs no offline migration;
- the grace window: a version's files are never deleted until a NEWER
  version has committed — the 100-swap concurrent-reader receipt reads
  through continuous swaps with ZERO FileNotFound (the window the old
  delete-then-rename swap could not close);
- retirement: keep_previous committed versions below current survive,
  older versions + uncommitted debris + (after one grace swap) legacy
  root files are retired, markers before dirs;
- catalog end-to-end: a reader thread scanning sessions through a
  burst of end_info read-modify-swaps never errors and always sees a
  fully-committed state (old or new, never torn).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from hbacker_spark.sources import storage


def _names(spark, path):
    return sorted(e["name"] for e in storage.list_path(spark, path))


def test_begin_commit_resolve_roundtrip(spark, tmp_path):
    path = str(tmp_path / "vdir")
    # empty/missing → legacy fallback: the path itself
    assert storage.resolve_data_dir(spark, path) == path
    assert storage.committed_versions(spark, path) == []

    n0, v0 = storage.begin_version(spark, path)
    assert n0 == 0 and v0.endswith("/v000000")
    storage.mkdirs(spark, v0)
    # written but NOT committed → still invisible to readers
    assert storage.resolve_data_dir(spark, path) == path
    storage.commit_version(spark, path, n0)
    assert storage.resolve_data_dir(spark, path) == v0
    assert storage.committed_versions(spark, path) == [0]

    # next begin skips over every number seen, committed or not
    n1, v1 = storage.begin_version(spark, path)
    assert n1 == 1
    storage.mkdirs(spark, v1)
    storage.commit_version(spark, path, n1)
    # keep_previous=1: v0 survives as the grace copy
    assert storage.resolve_data_dir(spark, path) == v1
    assert set(_names(spark, path)) == {
        "v000000", "v000001", "_v000000.commit", "_v000001.commit"
    }

    # the swap after that retires v0
    n2, v2 = storage.begin_version(spark, path)
    storage.mkdirs(spark, v2)
    storage.commit_version(spark, path, n2)
    assert set(_names(spark, path)) == {
        "v000001", "v000002", "_v000001.commit", "_v000002.commit"
    }


def test_debris_and_legacy_retirement(spark, tmp_path):
    """Crashed-writer dirs (no marker) below the new commit are swept;
    legacy root files survive the FIRST versioned commit (they are the
    grace copy) and retire at the second."""
    path = str(tmp_path / "legacy")
    storage.save_info(spark, f"{path}/part-legacy.parquet", "old data")
    storage.save_info(spark, f"{path}/_SUCCESS", "")
    assert storage.resolve_data_dir(spark, path) == path  # legacy layout

    # a crashed writer left v000000 without a marker: invisible, swept
    storage.mkdirs(spark, storage.version_dir(path, 0))
    assert storage.resolve_data_dir(spark, path) == path

    n, vdir = storage.begin_version(spark, path)
    assert n == 1  # debris number is never reused
    storage.mkdirs(spark, vdir)
    storage.commit_version(spark, path, n)
    names = _names(spark, path)
    assert "v000000" not in names  # debris swept
    assert "part-legacy.parquet" in names  # grace copy kept
    assert storage.resolve_data_dir(spark, path) == vdir

    n2, v2 = storage.begin_version(spark, path)
    storage.mkdirs(spark, v2)
    storage.commit_version(spark, path, n2)
    names = _names(spark, path)
    assert "part-legacy.parquet" not in names and "_SUCCESS" not in names
    assert set(names) == {"v000001", "v000002", "_v000001.commit", "_v000002.commit"}


def test_concurrent_reader_through_100_swap_cycles(spark, tmp_path):
    """The r11 headline receipt: a reader resolving per operation reads
    through ONE HUNDRED swap cycles with zero FileNotFound and never a
    torn state — each resolved generation file exists and carries
    exactly its generation's content. This is the window the old
    delete-then-rename swap left open on every scheme."""
    path = str(tmp_path / "hot")
    errors: list[Exception] = []
    seen: set[int] = set()
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                d = storage.resolve_data_dir(spark, path)
                if d == path:  # nothing committed yet
                    continue
                gen = int(d[-6:])
                content = storage.read_info(spark, f"{d}/data.txt").strip()
                assert content == f"gen-{gen}", (d, content)
                seen.add(gen)
            except Exception as exc:  # noqa: BLE001 — the test IS this
                errors.append(exc)
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    for i in range(100):
        n, vdir = storage.begin_version(spark, path)
        storage.save_info(spark, f"{vdir}/data.txt", f"gen-{n}")
        storage.commit_version(spark, path, n)
    done.set()
    t.join(timeout=30)
    assert not errors, errors[:3]
    assert len(seen) >= 5, "reader should observe many generations"
    # steady state: current + one grace copy, nothing else accrues
    assert set(_names(spark, path)) == {
        "v000098", "v000099", "_v000098.commit", "_v000099.commit"
    }


def test_catalog_reader_never_errors_across_end_info_swaps(spark, tmp_path):
    """Catalog end-to-end over the versioned layout: a reader scanning
    ``sessions`` (fresh resolve per read, like any C5–C10 query) races
    a burst of end_info read-modify-swaps — zero errors, every
    observed row count is the seeded count (swaps update in place,
    never expose a partial table), and the final state reflects the
    last swap."""
    from hbacker_spark.catalog.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    for i in range(6):
        cat.start_info("export", "c1", f"s{i}", "file:///dest", 0, 0)

    errors: list[Exception] = []
    counts: set[int] = set()
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                counts.add(cat.read("sessions").count())
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    for i in range(6):
        for _ in range(2):  # 12 swaps total
            cat.end_info("export", "c1", f"s{i}", "file:///dest", wait=True)
    done.set()
    t.join(timeout=60)
    assert not errors, errors[:3]
    assert counts == {6}, counts
    ended = cat.read("sessions").filter(F.col("ended_at").isNotNull()).count()
    assert ended == 6


def test_stale_lock_ttl_takeover_including_stampless(spark, tmp_path):
    """ADVICE r10 + r11 review: an opted-in TTL takes over a crashed
    holder's lock — INCLUDING one that died between the atomic claim
    and writing its pid/timestamp stamp (age then falls back to the
    lockfile's mtime); a fresh lock under the TTL still raises loudly,
    with the lock age in the message."""
    import time as _time

    import pytest as _pytest

    lock = str(tmp_path / "res.lock")
    assert storage.create_new_file(spark, lock)  # stamp-less "crash"
    _time.sleep(1.2)
    with _pytest.warns(RuntimeWarning, match="takeover"):
        with storage.path_fence(spark, lock, stale_ttl_s=1.0, what="res"):
            pass
    assert not storage.exists(spark, lock)  # released after the fenced work

    assert storage.create_new_file(spark, lock)
    with _pytest.raises(RuntimeError, match="old"):  # age in the message
        with storage.path_fence(spark, lock, stale_ttl_s=3600.0, what="res"):
            pass
    storage.delete_path(spark, lock, recursive=False)
