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


def test_stale_lock_ttl_takeover_including_stampless(spark, tmp_path, monkeypatch):
    """ADVICE r10 + r11 review: an opted-in TTL takes over a crashed
    holder's lock — INCLUDING one that died between the atomic claim
    and writing its pid/timestamp stamp (age then falls back to the
    lockfile's mtime); a fresh lock under the TTL still raises loudly,
    with the lock age in the message. The takeover threshold is floored
    at 3x the heartbeat (r12) so the test shrinks the heartbeat to keep
    a 1s TTL meaningful."""
    import time as _time

    import pytest as _pytest

    monkeypatch.setenv("SPARK_GRAFT_FENCE_HEARTBEAT_S", "0.2")
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


def test_live_holder_heartbeat_defeats_ttl_takeover(spark, tmp_path, monkeypatch):
    """ADVICE r11 (medium): a LIVE holder legitimately exceeding the
    stale TTL (a long rebuild under a TTL sized for catalog swaps) must
    NOT lose its lock — the holder's heartbeat keeps the stamp fresh,
    so a waiter with a tiny TTL times out loudly instead of taking
    over mid-mutation."""
    import threading as _threading
    import time as _time

    import pytest as _pytest

    monkeypatch.setenv("SPARK_GRAFT_FENCE_HEARTBEAT_S", "0.2")
    lock = str(tmp_path / "long.lock")
    entered = _threading.Event()
    release = _threading.Event()

    def long_holder():
        with storage.path_fence(spark, lock, what="long-op"):
            entered.set()
            release.wait(timeout=30)

    t = _threading.Thread(target=long_holder, daemon=True)
    t.start()
    assert entered.wait(timeout=10)
    _time.sleep(1.5)  # hold far past the waiter's TTL; heartbeats ticking
    # waiter: TTL 0.7s < hold time, but the stamp is at most ~0.2s old —
    # takeover must NOT fire; the bounded wait expires loudly instead
    with _pytest.raises(RuntimeError, match="single-writer"):
        with storage.path_fence(
            spark, lock, stale_ttl_s=0.7, wait_s=1.0, what="long-op"
        ):
            pass
    assert storage.exists(spark, lock), "live holder must keep its lock"
    release.set()
    t.join(timeout=10)
    assert not storage.exists(spark, lock)


def test_takeover_reclaim_verifies_claim_token(spark, tmp_path, monkeypatch):
    """ADVICE r11 (medium): two waiters crossing the TTL together could
    both 'win' the delete+create on an advisory scheme. The post-claim
    token verify makes the loser back off loudly WITHOUT deleting the
    winner's lock: simulate the lost race by having the loser's stamp
    overwritten by a competing claimant between stamp and verify."""
    import pytest as _pytest

    monkeypatch.setenv("SPARK_GRAFT_FENCE_HEARTBEAT_S", "0.2")
    lock = str(tmp_path / "race.lock")
    assert storage.create_new_file(spark, lock)  # crashed holder, stamp-less

    real_save = storage.save_info
    clobbered = {"done": False}

    def competing_save(spark_, path, data):
        real_save(spark_, path, data)
        if path == lock and not clobbered["done"]:
            clobbered["done"] = True
            # the OTHER taker's stamp lands right after ours
            real_save(spark_, path, "pid=99999 token=intruder at=2026-01-01T00:00:00")

    monkeypatch.setattr(storage, "save_info", competing_save)
    import time as _time

    _time.sleep(1.0)
    with _pytest.warns(RuntimeWarning, match="takeover"):
        with _pytest.raises(RuntimeError, match="post-claim verify"):
            with storage.path_fence(spark, lock, stale_ttl_s=0.7, what="race"):
                pass
    # the loser must NOT have deleted the winner's lock
    assert storage.exists(spark, lock)
    holder = storage.read_info(spark, lock)
    assert "intruder" in holder
    storage.delete_path(spark, lock, recursive=False)


def test_ttl_retention_outlives_rapid_mutations(spark, tmp_path):
    """VERDICT r11 #2 (marker layout): with a retention TTL, a reader
    holding ANY version survives a burst of rapid mutations — versions
    superseded less than TTL ago stay readable beyond the count grace —
    and retirement proceeds once the TTL expires."""
    import time as _time

    path = str(tmp_path / "ttl")
    # v0..v3: three rapid mutations after v0 commits, all inside a 60s TTL
    dirs = []
    for i in range(4):
        n, vdir = storage.begin_version(spark, path)
        storage.save_info(spark, f"{vdir}/data.txt", f"gen-{n}")
        storage.commit_version(spark, path, n, ttl_s=60.0)
        dirs.append(vdir)
    # count-grace alone would have kept only v2+v3; TTL keeps them ALL
    assert storage.committed_versions(spark, path) == [0, 1, 2, 3]
    for i, vdir in enumerate(dirs):  # the reader's resolved files still exist
        assert storage.read_info(spark, f"{vdir}/data.txt") == f"gen-{i}"

    # TTL expiry: re-commit with a tiny TTL after the supersessions aged
    _time.sleep(1.1)
    n, vdir = storage.begin_version(spark, path)
    storage.save_info(spark, f"{vdir}/data.txt", f"gen-{n}")
    storage.commit_version(spark, path, n, ttl_s=1.0)
    assert storage.committed_versions(spark, path) == [3, 4]  # grace + current


def test_ttl_retention_index_data_versions(spark, tmp_path):
    """VERDICT r11 #2 (tombstone layout): index data versions carry
    supersession tombstones; inside the TTL a superseded data dir
    survives extra swaps (a reader's resolved files finish), after the
    TTL it retires; crashed-writer debris (no tombstone) still drops
    immediately."""
    import time as _time

    from hbacker_spark.operators.ann_index import _retire_data_versions

    base = str(tmp_path / "sigs")
    storage.save_info(spark, f"{storage.version_dir(base, 0)}/f.parquet", "0")
    # debris dir: version 9 was never pointed at (no tombstone ever)
    storage.mkdirs(spark, storage.version_dir(base, 9))

    # mutation 1: pointer 0 -> 1 (0 becomes grace, tombstoned)
    storage.save_info(spark, f"{storage.version_dir(base, 1)}/f.parquet", "1")
    _retire_data_versions(spark, base, current=1, keep=0, ttl_s=60.0)
    names = {e["name"] for e in storage.list_path(spark, base)}
    assert "v000009" not in names, "debris drops immediately"
    assert "_v000000.superseded" in names and "v000000" in names
    # mutations 2,3: rapid swaps inside the TTL — v0 (superseded <TTL ago)
    # must survive BOTH, well beyond the one-swap count grace
    storage.save_info(spark, f"{storage.version_dir(base, 2)}/f.parquet", "2")
    _retire_data_versions(spark, base, current=2, keep=1, ttl_s=60.0)
    storage.save_info(spark, f"{storage.version_dir(base, 3)}/f.parquet", "3")
    _retire_data_versions(spark, base, current=3, keep=2, ttl_s=60.0)
    names = {e["name"] for e in storage.list_path(spark, base)}
    assert {"v000000", "v000001", "v000002", "v000003"} <= names
    assert storage.read_info(spark, f"{base}/v000000/f.parquet") == "0"

    # TTL expiry: the aged tombstones let everything but grace+current go
    _time.sleep(1.1)
    _retire_data_versions(spark, base, current=3, keep=2, ttl_s=1.0)
    names = {e["name"] for e in storage.list_path(spark, base)}
    assert {"v000002", "v000003"} <= names
    assert "v000000" not in names and "v000001" not in names
    assert "_v000000.superseded" not in names, "tombstone retired with its dir"


@pytest.fixture
def object_store_routing(monkeypatch):
    """Route every claim through the OBJECT-STORE branch of
    create_new_file_ex while actually running against the local tmp
    filesystem — so the conditional-create probe, the builder claim, and
    the advisory fallback all execute for real."""
    monkeypatch.setattr(storage, "_classify_scheme", lambda scheme: "object")
    # isolate per-test probe/warning memoization
    monkeypatch.setattr(storage, "_COND_CREATE_PROBED", {})
    monkeypatch.setattr(storage, "_WARNED_SCHEMES", set())
    yield


def test_conditional_create_probe_off_warns_advisory(
    spark, tmp_path, object_store_routing, monkeypatch
):
    """VERDICT r11 #1, probe OFF: a store without the conditional-create
    capability (the local FS answers hasPathCapability=false) falls back
    to the warned advisory claim — RuntimeWarning exactly once per
    scheme, claim kind 'advisory'."""
    import warnings as _warnings

    monkeypatch.delenv("SPARK_GRAFT_CONDITIONAL_CREATE", raising=False)
    lock = str(tmp_path / "adv.lock")
    with pytest.warns(RuntimeWarning, match="ADVISORY"):
        got, kind = storage.create_new_file_ex(spark, lock)
    assert got is True and kind == "advisory"
    # second claim: already exists, and the warning never repeats
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        got2, kind2 = storage.create_new_file_ex(spark, str(tmp_path / "adv2.lock"))
    assert got2 is True and kind2 == "advisory"
    assert not storage.create_new_file_ex(spark, lock)[0]


def test_conditional_create_probe_on_atomic_no_warning(
    spark, tmp_path, object_store_routing, monkeypatch
):
    """VERDICT r11 #1, probe forced ON: the claim goes through the real
    createFile() builder (overwrite=false), wins exactly once, reports
    the loser via the existing-file signal, and the advisory
    RuntimeWarning does NOT fire — the fence is atomic, nothing to warn
    about."""
    import warnings as _warnings

    monkeypatch.setenv("SPARK_GRAFT_CONDITIONAL_CREATE", "on")
    lock = str(tmp_path / "cond.lock")
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # any warning fails the test
        got, kind = storage.create_new_file_ex(spark, lock)
        assert got is True and kind == "atomic"
        got2, kind2 = storage.create_new_file_ex(spark, lock)
    assert got2 is False and kind2 == "atomic"


def test_fence_green_under_object_store_routing_both_probe_modes(
    spark, tmp_path, object_store_routing, monkeypatch
):
    """The full path_fence contract (claim → stamp → heartbeat → release,
    contention raises) stays green when claims route through the
    object-store branch, with the probe forced on AND off."""
    for mode, name in (("on", "c"), ("off", "a")):
        monkeypatch.setenv("SPARK_GRAFT_CONDITIONAL_CREATE", mode)
        lock = str(tmp_path / f"{name}.lock")
        import warnings as _warnings

        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")  # advisory warning, probe off
            with storage.path_fence(spark, lock, what=f"res-{name}"):
                assert storage.exists(spark, lock)
                with pytest.raises(RuntimeError, match="single-writer"):
                    with storage.path_fence(spark, lock, what=f"res-{name}"):
                        pass
            assert not storage.exists(spark, lock)


def test_reservation_crash_recovery_and_number_nonreuse(spark, tmp_path):
    """r12 reservation layer, crash paths: a writer that died after
    reserving (stale reserve, maybe with a partial dir) must neither
    block future writers nor have its number REUSED (reuse would let a
    later writer collide with debris); once the stale grace expires the
    debris sweeps, reserve included."""
    import os as _os
    import time as _time

    path = str(tmp_path / "resv")
    # healthy first version
    n0, v0 = storage.begin_version(spark, path)
    storage.save_info(spark, f"{v0}/data.txt", "gen-0")
    storage.commit_version(spark, path, n0)
    assert not storage.exists(spark, f"{path}/.v{n0:06d}.reserve"), (
        "reserve must be cleaned once its version commits"
    )

    # crashed writer: reserved n1, wrote a partial dir, died
    n1, v1 = storage.begin_version(spark, path)
    storage.save_info(spark, f"{v1}/partial.txt", "half")

    # a new writer must skip PAST the crashed number, even in-flight
    n2, v2 = storage.begin_version(spark, path)
    assert n2 == n1 + 1, (n1, n2)
    storage.save_info(spark, f"{v2}/data.txt", f"gen-{n2}")
    storage.commit_version(spark, path, n2)
    # the young reservation protects the crashed writer's dir (it could
    # still be in-flight on an advisory scheme)
    names = _names(spark, path)
    assert f"v{n1:06d}" in names, "in-flight-reserved dir must not be swept"

    # age the reservation past the in-flight grace → it IS crash debris
    reserve = str(tmp_path / "resv" / f".v{n1:06d}.reserve")
    old = _time.time() - 7200
    _os.utime(reserve, (old, old))
    n3, v3 = storage.begin_version(spark, path)
    storage.save_info(spark, f"{v3}/data.txt", f"gen-{n3}")
    storage.commit_version(spark, path, n3)
    names = _names(spark, path)
    assert f"v{n1:06d}" not in names, "stale-reserved debris must sweep"
    assert f".v{n1:06d}.reserve" not in names, "its reserve sweeps with it"
    # resolve is on the latest committed version throughout
    assert storage.resolve_data_dir(spark, path).endswith(f"v{n3:06d}")


def test_reservation_prevents_same_number_double_claim(spark, tmp_path):
    """Two writers beginning concurrently (advisory fence: both got
    past it) must receive DIFFERENT version numbers — the reserve file
    is the atomic claim."""
    path = str(tmp_path / "claim")
    n_a, v_a = storage.begin_version(spark, path)
    # second beginner while the first has neither written nor committed
    n_b, v_b = storage.begin_version(spark, path)
    assert n_a != n_b and v_a != v_b
