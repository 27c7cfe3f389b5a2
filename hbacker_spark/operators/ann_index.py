"""Persisted ANN indexes: build at ingest, serve from storage.

The r9 serving forms (`ann_topk_indexed` / `ivf_topk_indexed`,
operators/similarity.py) answer many queries against ONE in-session
index DataFrame. This module is the missing third leg: the index as a
STORED artifact that outlives the session — built once by the ingest
pipeline, persisted in a layout whose directory structure IS the probe
structure, and served by readers whose per-query IO is provably a few
partitions, not the index.

Layouts (both under one ``index_path`` root, all Spark-native parquet —
works on any scheme the session's Hadoop conf can reach: data writes go
through Spark and ALL maintenance filesystem ops (geometry commit,
compaction, scrub, health listing) go through the Hadoop FileSystem
API, never ``os``/``shutil`` (ADVICE r9). Since r11 every
data-invalidating mutation publishes a NEW data version dir
(``signatures/v000002`` …) pointed at by the geometry row's
``data_version`` and cut over by the geometry commit marker — reads
are wait-free on every scheme and the previous version survives one
further swap as the in-flight readers' grace copy (storage module,
"Versioned directories"). The mutation fence claims via
``storage.create_new_file_ex`` — atomic on local/HDFS AND on object
stores advertising Hadoop 3.4.1+ conditional create (If-None-Match
PUT, r12); only capability-less stores degrade to an advisory claim
(runtime warning, ADVICE r10) where deployments must serialize index
writers externally; reads are safe everywhere regardless):

- LSH:  ``signatures/`` partitioned by ``(table_idx, shard)`` where
  ``shard = bucket % n_shards`` — a probe touches at most
  n_tables·(1+multiprobe) (table, shard) directories out of
  n_tables·n_shards, and the full probe-set predicate is a driver-side
  LITERAL (the probe buckets are a pure function of the query vector),
  so it pushes as PartitionFilters + parquet row-group stats instead of
  a join. Files are sorted by ``bucket`` within each partition so the
  residual bucket membership prunes row groups too.
- IVF:  ``assignments/`` partitioned by ``centroid_id`` — a probe reads
  exactly its ``nprobe`` list directories; ``centroids/`` holds the
  (tiny) int64 centroid matrix as (j, k, c) rows.
- Both: ``geometry/`` — a one-row parquet recording the build geometry
  (planes/tables/centroids/seed/quant/shards). Serving reads geometry
  from the index, never from caller arguments, so a query can never
  silently probe with a mismatched geometry (the bug class the
  in-memory serving forms push onto the caller). A QUANT mismatch
  against the running code raises instead of returning wrong buckets.

Why this matters at 100 TB: the index itself is corpus-sized (n_tables
rows per vector for LSH, one per vector for IVF). The in-memory serving
forms re-scan it per query; partition layout turns a query into
O(probed directories) of IO. Query-time knobs that need no reindex
(``multiprobe``, ``multiprobe_bits``, ``nprobe``, ``k``) stay per-call
arguments; everything baked into the stored artifact comes from
``geometry/``.

Reference parity note: the reference has no ANN surface; this extends
the training-data pipeline family (SURVEY.md §2.C similarity search)
with the serve-from-storage shape its export/import snapshots use for
table data (lib/hbacker/hbacker.rb export/import pairing).
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbacker_spark.sources import storage
from hbacker_spark.sources.tables import driver_local_df
from hbacker_spark.operators.similarity import (
    DEFAULT_TABLES,
    QUANT,
    SEED,
    TRAIN_ITERS,
    ivf_topk_indexed,
    lsh_signatures,
    query_probe_buckets,
    recommended_centroids,
    recommended_nprobe,
    recommended_planes,
)

DEFAULT_SHARDS = 64

# Bounded waits for the per-index mutation fence. Maintenance ops
# (compact/scrub/rebuild) racing each other keep a tight bound — two
# concurrent maintenance drivers is a deployment bug to surface.
# APPENDS wait much longer: an append acquires the fence FIRST and only
# then reads the stored geometry, so waiting out a rebuild is strictly
# safe (the append hashes under whatever geometry the maintenance op
# left behind) — and a streaming ingest batch crashing because routine
# maintenance held the lock 31s would be the worse failure. Same
# asymmetry as the catalog's APPEND_FENCE_WAIT_S.
INDEX_FENCE_WAIT_S = 30.0
INDEX_APPEND_WAIT_S = 600.0

_GEOMETRY_SCHEMA = (
    "kind string, n_planes int, n_tables int, n_centroids int, dim int, "
    "seed int, quant long, n_shards int, train_iters int, n_rows long, "
    "last_batch_id long, last_stream_id string, has_vectors boolean, "
    "version long, data_version long, ingest_epoch long"
)


class IndexGeometryError(ValueError):
    """The stored index was built under a geometry the running code
    cannot reproduce (e.g. a different QUANT fixed-point scale) —
    probing would silently return wrong buckets, so refuse loudly."""


class IndexContentionError(RuntimeError):
    """Two index mutators (append/compact/scrub/rebuild) raced past the
    bounded fence wait. Index mutation is single-writer by contract;
    quiesce the other writer (or wait out the maintenance op) and
    retry — the loser raises instead of silently losing rows under a
    concurrent directory swap."""


def _mutation_fence(spark: SparkSession, index_path: str, wait_s: float | None = None):
    """Per-index single-writer fence (VERDICT r9 #6) — a lockfile
    BESIDE the index root, claimed via the atomic
    ``FileSystem.createNewFile``.
    Taken by every mutating op: appends (incl. streaming ingest's
    foreachBatch), compact, scrub, rebuild. Readers and open handles
    never take it — see the handle classes for the read contract.
    ``wait_s`` resolves at call time so tests (and operators) can
    tighten the bound via the module constant."""
    return storage.path_fence(
        spark,
        f"{index_path}.lock",
        wait_s=INDEX_FENCE_WAIT_S if wait_s is None else wait_s,
        error=IndexContentionError,
        what=f"ANN index {index_path}",
    )


def _write_geometry(
    spark: SparkSession, index_path: str, row: dict, purge: bool = False
) -> None:
    """Publish the geometry row as a new committed VERSION of the
    ``geometry/`` dir (VERDICT r10 #1; storage.commit_version): the
    write lands in ``geometry/v000NNN/`` and becomes visible with one
    commit-marker create, while the previous version's files survive
    one further swap — so :func:`read_geometry` (and through it
    ``is_current()`` serving loops) is WAIT-FREE on every scheme; the
    old two-rename gap where ``geometry`` momentarily did not exist is
    gone. Geometry is also the index's data POINTER: ``data_version``
    names the ``signatures/vNNNNNN`` (or ``assignments/``/
    ``centroids/``) version this geometry describes, so the marker
    create is the single atomic cutover for the WHOLE index — a reader
    sees old geometry + old data or new geometry + new data, never a
    cross-version mix (the root-rename rebuild this replaces could
    not offer that without a window). S3A: the marker is a new-key PUT
    (atomic in visibility); only the writer fence stays advisory
    there (storage module note)."""
    base = {
        "kind": None, "n_planes": None, "n_tables": None, "n_centroids": None,
        "dim": None, "seed": None, "quant": QUANT, "n_shards": None,
        "train_iters": None, "n_rows": None, "last_batch_id": None,
        "last_stream_id": None, "has_vectors": False, "version": 0,
        "data_version": None, "ingest_epoch": 0,
    }
    base.update(row)
    path = f"{index_path}/geometry"
    n, vdir = storage.begin_version(spark, path)
    spark.createDataFrame([tuple(base.values())], _GEOMETRY_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(vdir)
    if purge:
        # RTBF forced purge (VERDICT r11 #5): no grace geometry either —
        # a reader resolving the old geometry would chase a data_version
        # pointer whose bytes are being purged right now; retiring it
        # makes the stale handle fail at the pointer, not mid-scan
        storage.commit_version(spark, path, n, keep_previous=0, ttl_s=0.0)
    else:
        storage.commit_version(spark, path, n)


_GEOMETRY_DEFAULTS = {
    "last_batch_id": None,
    "last_stream_id": None,
    "has_vectors": False,
    "version": 0,
    "data_version": None,
    "ingest_epoch": 0,
}


def read_geometry(spark: SparkSession, index_path: str) -> dict:
    gdir = storage.resolve_data_dir(spark, f"{index_path}/geometry")
    geo = spark.read.parquet(gdir).first().asDict()
    # forward-compat: an index written before a geometry field existed
    # reads as the field's default instead of KeyError-ing every op on
    # older indexes each time the schema grows (fields were appended in
    # this order: n_rows → last_batch_id/last_stream_id → has_vectors →
    # data_version/ingest_epoch)
    for k, v in _GEOMETRY_DEFAULTS.items():
        geo.setdefault(k, v)
    geo.setdefault("n_rows", None)
    if geo["quant"] != QUANT:
        raise IndexGeometryError(
            f"index at {index_path} was built at fixed-point scale "
            f"{geo['quant']}, running code uses {QUANT} — rebuild the index"
        )
    return geo


def _data_sub(geo: dict) -> str:
    return "signatures" if geo["kind"] == "lsh" else "assignments"


def index_data_dir(index_path: str, geo: dict, sub: str | None = None) -> str:
    """Where the index data the given geometry describes lives: the
    ``data_version`` dir under ``signatures/``/``assignments/`` (or an
    explicit ``sub`` like ``centroids``); legacy pre-r11 indexes
    (``data_version`` None) keep their data at the subdir root. This is
    the ONE resolution rule — every reader and mutator goes through it,
    so geometry and data can never be read cross-version."""
    base = f"{index_path}/{sub or _data_sub(geo)}"
    dv = geo.get("data_version")
    return storage.version_dir(base, int(dv)) if dv is not None else base


def _live_data_version(spark: SparkSession, index_path: str) -> int | None:
    """The data version the CURRENT geometry points at (None when no
    readable geometry exists or the index is legacy-rooted) — captured
    by every mutation BEFORE it writes, so retirement can keep exactly
    the directory in-flight readers are on (see _retire_data_versions).
    Broad catch on purpose: a fresh path, a foreign/unreadable geometry,
    or a quant mismatch all mean "no committed version to protect"."""
    try:
        dv = read_geometry(spark, index_path).get("data_version")
        return int(dv) if dv is not None else None
    except Exception:  # noqa: BLE001
        return None


def _layout(geo: dict) -> tuple[str, str | None, list[str]]:
    """(data subdir, within-partition sort column, partition columns)
    for the index kind — the one dispatch compact/scrub share."""
    if geo["kind"] == "lsh":
        return "signatures", "bucket", ["table_idx", "shard"]
    return "assignments", None, ["centroid_id"]


def _retire_data_versions(
    spark: SparkSession,
    base: str,
    current: int,
    keep: int | None,
    ttl_s: float | None = None,
    purge: bool = False,
) -> None:
    """Drop data version dirs the grace window no longer needs — the
    unmarked-dir twin of storage.commit_version's retirement (data dirs
    need no commit markers: geometry's ``data_version`` IS the commit).

    ``keep`` is the version the PRE-mutation geometry pointed at — the
    one directory in-flight readers and pre-open handles resolved, so
    the one the one-swap grace contract protects. It must be named
    EXPLICITLY (r11 review): "newest below current" is wrong the first
    mutation after a crash, when an unmarked debris dir from the failed
    writer outnumbers the real live version — keeping by number would
    preserve the debris and delete the directory readers are actually
    on. ``keep=None`` means the pre-mutation data lived at the LEGACY
    root, so legacy entries are the grace copy.

    Retention TTL (VERDICT r11 #2): superseded versions carry a
    supersession TOMBSTONE (``_vNNNNNN.superseded`` beside the dirs,
    written the moment the geometry pointer moved off them; legacy
    roots get ``_legacy.superseded``) and retire only once the
    tombstone is older than ``storage.version_ttl_s`` — so an index
    scan that resolved ANY live data version gets at least TTL seconds
    to finish no matter how rapid the mutation burst. Tombstone-less
    version dirs are crashed-writer debris (they were never pointed
    at) and drop immediately, same as r11.

    ``purge=True`` (VERDICT r11 #5, RTBF): compliance deletion — retire
    EVERYTHING except ``current`` right now, TTL and grace be damned;
    in-flight readers of the purged copy fail loudly (FileNotFound),
    which is the desired behavior for a right-to-be-forgotten deadline.
    Caller holds the fence either way."""
    entries = storage.list_path(spark, base)
    names = {e["name"] for e in entries}
    ttl = 0.0 if purge else storage.version_ttl_s(ttl_s)
    now = time.time()
    grace_s = storage._inflight_grace_s()
    reserves = {
        int(m.group(1)): e["mtime_s"]
        for e in entries
        if (m := storage._RESERVE_RE.match(e["name"]))
    }

    def tombstone(name: str) -> str:
        return storage.join_path(base, name)

    def superseded_age(tomb: str) -> float | None:
        for e in entries:
            if e["name"] == tomb:
                return max(0.0, now - e["mtime_s"])
        return None

    kept_or_current: set[int] = {current}
    for e in entries:
        m = storage._VERSION_RE.match(e["name"])  # one regex, one layout
        if m:
            k = int(m.group(1))
            if k == current:
                continue
            if k == keep and not purge:
                kept_or_current.add(k)
                # just superseded by this mutation: stamp the tombstone
                # (idempotent — never refresh an existing one, that
                # would extend the window on every no-op pass)
                ts = f"_v{k:06d}.superseded"
                if ts not in names:
                    storage.save_info(spark, tombstone(ts), f"at={now}")
                continue
            age = superseded_age(f"_v{k:06d}.superseded")
            if age is None and not purge:
                # tombstone-less = crash debris — unless an in-flight
                # reservation protects it (r12): on advisory schemes a
                # concurrent writer may still be writing this dir
                r = reserves.get(k)
                if r is not None and now - r <= grace_s:
                    continue
            # r13 (ADVICE r12, low): in purge mode delete EVERY
            # superseded version unconditionally — routing through the
            # TTL comparison let a version whose tombstone mtime sits
            # at/ahead of the driver clock (server-side mtime skew,
            # coarse granularity) clamp to age 0.0, and `0.0 > 0.0` is
            # False — an RTBF purge silently leaving forgotten bytes.
            if purge or age is None or age > ttl:
                storage.delete_path(spark, storage.join_path(base, e["name"]))
                storage.delete_path(spark, tombstone(f"_v{k:06d}.superseded"), recursive=False)
                storage.delete_path(spark, tombstone(f".v{k:06d}.reserve"), recursive=False)
        elif storage._SUPERSEDED_RE.match(e["name"]):
            # orphan tombstone (its dir already retired): sweep
            k = int(storage._SUPERSEDED_RE.match(e["name"]).group(1))
            if f"v{k:06d}" not in names:
                storage.delete_path(spark, tombstone(e["name"]), recursive=False)
        elif storage._is_layout_marker(e["name"]):
            continue  # reserves handled below; legacy tombstone further down
    # reservation cleanup: a data version the geometry points at (or
    # keeps as grace) is fully written — its reserve's job is done
    for k in reserves:
        if k in kept_or_current:
            storage.delete_path(spark, tombstone(f".v{k:06d}.reserve"), recursive=False)
    # legacy root entries: grace copy while keep is None (stamp their
    # supersession the first time a versioned dir takes over), TTL-bound
    # retirement after that
    legacy = [
        e["name"]
        for e in entries
        if not storage._VERSION_RE.match(e["name"])
        and not storage._is_layout_marker(e["name"])
    ]
    if legacy:
        if keep is None and not purge:
            if storage._LEGACY_TOMBSTONE not in names:
                storage.save_info(spark, tombstone(storage._LEGACY_TOMBSTONE), f"at={now}")
        else:
            age = superseded_age(storage._LEGACY_TOMBSTONE)
            if purge or age is None or age > ttl:
                for name in legacy:
                    storage.delete_path(spark, storage.join_path(base, name))
                storage.delete_path(spark, tombstone(storage._LEGACY_TOMBSTONE), recursive=False)
    elif storage._LEGACY_TOMBSTONE in names:
        storage.delete_path(spark, tombstone(storage._LEGACY_TOMBSTONE), recursive=False)


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------


def build_lsh_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    n_shards: int = DEFAULT_SHARDS,
) -> dict:
    """Hash the corpus once and persist the signature index.

    ``n_planes=None`` auto-sizes with the corpus (the production
    default, same contract as ann_candidate_pairs). The write is ONE
    pass over the corpus: signature mapInPandas → shuffle on the
    partition keys → sorted parquet. ``repartition(table_idx, shard)``
    bounds output files to one per partition directory (without it,
    every input task writes a sliver into every directory — the
    small-files problem at scale), and ``sortWithinPartitions(bucket)``
    gives the files monotone bucket row groups so the residual bucket
    predicate prunes inside each shard. Returns the geometry dict (also
    persisted under ``geometry/``). Runs under the per-index mutation
    fence; building OVER an existing index bumps its geometry
    ``version`` so handles opened on the old data fail loudly.
    """
    spark = df.sparkSession
    with _mutation_fence(spark, index_path):
        geo = _build_lsh_under_fence(
            df, index_path, id_col, vec_col, n_planes, n_tables, seed, n_shards,
            version=_next_version(spark, index_path),
        )
    geo["quant"] = QUANT
    return geo


def _build_lsh_under_fence(
    df: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    n_planes: int | None,
    n_tables: int,
    seed: int,
    n_shards: int,
    version: int,
    carry: dict | None = None,
) -> dict:
    """Shared build body (caller holds the mutation fence): hash the
    corpus into the NEXT data version dir under ``signatures/``, then
    publish it by committing a geometry row whose ``data_version``
    points at it — one atomic cutover, previous data version kept for
    in-flight readers, older ones retired (VERDICT r10 #1). ``carry``
    lets rebuild preserve the streaming watermark fields."""
    spark = df.sparkSession
    old_dv = _live_data_version(spark, index_path)
    n_rows = df.count()
    if n_planes is None:
        n_planes = recommended_planes(n_rows)
    dv, vdir = storage.begin_version(spark, f"{index_path}/signatures")
    sigs = lsh_signatures(df, id_col, vec_col, n_planes, n_tables, seed).withColumn(
        "shard", F.pmod(F.col("bucket"), F.lit(int(n_shards))).cast("int")
    )
    (
        sigs.repartition("table_idx", "shard")
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("table_idx", "shard")
        .parquet(vdir)
    )
    geo = {
        "kind": "lsh",
        "n_planes": int(n_planes),
        "n_tables": int(n_tables),
        "seed": int(seed),
        "n_shards": int(n_shards),
        "n_rows": int(n_rows),
        "version": version,
        "data_version": dv,
    }
    geo.update(carry or {})
    _write_geometry(spark, index_path, geo)
    _retire_data_versions(spark, f"{index_path}/signatures", dv, old_dv)
    return geo


def _next_version(spark: SparkSession, index_path: str) -> int:
    """Next geometry version for a (re)build over ``index_path``: prior
    version + 1 when a readable geometry exists, else 0. A data-
    invalidating mutation (rebuild-in-place, compact, scrub) must bump
    the version so :meth:`StoredLshIndex.is_current` can detect it."""
    if storage.exists(spark, f"{index_path}/geometry"):
        try:
            return int(read_geometry(spark, index_path).get("version") or 0) + 1
        except Exception:  # noqa: BLE001 — unreadable/foreign geometry
            return 0
    return 0


def append_lsh_index(
    df_new: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
    stream_id: str | None = None,
) -> dict:
    """Incremental ingest into a stored LSH index — NO rebuild.

    Signatures are a pure per-row function of the STORED geometry, so
    hashing only the new vectors and appending their rows into the same
    (table_idx, shard) directories yields byte-for-byte the signature
    SET a full rebuild over old∪new would produce (pinned in tests —
    the same fold==rebuild contract as ann_pairs_state). Geometry is
    read from the index, never passed: an append can't drift the hash
    function. ``n_rows`` in the geometry row advances so
    :func:`index_health` can tell when the corpus has outgrown the
    build-time plane count (the knob that does NOT need a reindex first
    is ``multiprobe`` — widen probes; reindex when health says so).
    Concurrency (VERDICT r9 #6): the whole append runs under the
    per-index mutation fence, so concurrent appends serialize (bounded
    wait, then IndexContentionError) and an append can never race a
    compact/scrub/rebuild directory swap and lose rows.

    ``batch_id`` makes the append idempotent for streaming ingest
    (foreachBatch is at-least-once): a replayed batch whose id is at or
    below the geometry's ``last_batch_id`` is a no-op. The guard is
    SCOPED to ``stream_id`` (the checkpoint location): Structured
    Streaming batch ids restart at 0 for a NEW checkpoint, so an
    unscoped guard would silently drop a fresh stream's every batch as
    a "replay" of the previous stream's ids — the watermark only means
    something within one checkpoint's id sequence. A differing
    stream_id resets the guard instead. The residual window — append
    job committed, geometry swap not yet landed, crash → replay
    double-appends — costs duplicate ROWS only, never wrong RESULTS
    (signatures are a deterministic per-row function and every serving
    path reduces candidates to a set); :func:`compact_index` drops
    exact duplicates, so the window is also space-repairable.
    """
    spark = df_new.sparkSession
    with _mutation_fence(spark, index_path, wait_s=INDEX_APPEND_WAIT_S):
        geo = read_geometry(spark, index_path)
        if geo["kind"] != "lsh":
            raise IndexGeometryError(f"index at {index_path} is {geo['kind']!r}, not lsh")
        if (
            batch_id is not None
            and geo["last_batch_id"] is not None
            and geo["last_stream_id"] == stream_id
            and batch_id <= geo["last_batch_id"]
        ):
            return geo  # replayed micro-batch of THIS stream: already folded
        n_new = df_new.count()
        sigs = lsh_signatures(
            df_new, id_col, vec_col, geo["n_planes"], geo["n_tables"], geo["seed"]
        ).withColumn("shard", F.pmod(F.col("bucket"), F.lit(geo["n_shards"])).cast("int"))
        (
            sigs.repartition("table_idx", "shard")
            .sortWithinPartitions("bucket")
            .write.mode("append")
            .partitionBy("table_idx", "shard")
            .parquet(index_data_dir(index_path, geo))
        )
        geo["n_rows"] = int(geo["n_rows"] or 0) + n_new
        if batch_id is not None:
            geo["last_batch_id"] = int(batch_id)
            geo["last_stream_id"] = stream_id
        _write_geometry(spark, index_path, geo)
    return geo


def lsh_probe_scan(
    sigs: DataFrame, probes: dict[int, list[int]], n_shards: int
) -> DataFrame:
    """The probed slice of a stored signature index: candidate vec_ids
    whose (table_idx, bucket) matches any probe bucket.

    The predicate is split into two conjuncts ON PURPOSE: the first
    references only the PARTITION columns (table_idx, shard), so the
    planner turns it into PartitionFilters — directory pruning before a
    single byte is read; the second is the exact (table_idx, bucket)
    membership, evaluated against the surviving files' row-group stats.
    A semi-join against a probe DataFrame (the in-memory serving form)
    could not prune directories — the probe set must be plan literals,
    which it is: a pure driver-side function of the query vector.
    """
    part_pred = F.lit(False)
    row_pred = F.lit(False)
    for t, buckets in probes.items():
        bs = [int(b) for b in buckets]
        shards = sorted({b % n_shards for b in bs})
        part_pred = part_pred | (
            (F.col("table_idx") == int(t)) & F.col("shard").isin(shards)
        )
        row_pred = row_pred | (
            (F.col("table_idx") == int(t)) & F.col("bucket").isin(bs)
        )
    return sigs.filter(part_pred & row_pred).select("vec_id").distinct()


class StoredLshIndex:
    """Open-once/query-many handle for a stored LSH index.

    Opening pays the fixed costs ONCE: the geometry read (one tiny
    Spark job) and the partition-directory listing (the relation's file
    index, built at ``read.parquet`` and cached on the relation) — at
    n_tables·n_shards directories that listing is the dominant
    per-query overhead if repeated (measured at x10: the re-open form
    spent ~3x the handle form's query wall on listing+geometry alone,
    STORED_SERVING.json). Each query then plans against the cached
    file index; partition pruning to the probed directories happens at
    planning, no relisting. This is the serving deployment shape: a
    query service opens the index at startup and answers from the
    handle.

    Read contract (VERDICT r9 #6): a handle serves a SNAPSHOT as of
    open. Appends after open are not visible (the cached file index
    doesn't relist) — reopen to see them. Data-invalidating
    maintenance (compact / scrub / rebuild) deletes the files the
    cached index points at, so a stale handle's queries fail LOUDLY
    (FileNotFound at scan time) — never silently wrong rows; those ops
    bump the geometry ``version``, and :meth:`is_current` probes it
    (one tiny geometry read) so serving loops can reopen proactively
    instead of on first failure. Handles take no lock: maintenance
    never waits on readers (quiesce-or-reopen is the deployment
    contract)."""

    def __init__(self, spark: SparkSession, index_path: str):
        geo = read_geometry(spark, index_path)
        if geo["kind"] != "lsh":
            raise IndexGeometryError(
                f"index at {index_path} is {geo['kind']!r}, not lsh"
            )
        self.spark = spark
        self.path = index_path
        self.geometry = geo
        self.version = int(geo.get("version") or 0)
        self.sigs = spark.read.parquet(index_data_dir(index_path, geo))

    def is_current(self) -> bool:
        """False once a compact/scrub/rebuild has superseded the files
        this handle serves from (geometry version advanced) — reopen.
        One metadata-sized geometry read; no data scan. Never raises
        (ADVICE r10): geometry reads are wait-free under the versioned
        layout, but a deleted/mid-migration index still reads as
        "stale" rather than crashing the serving loop the probe
        exists to protect."""
        try:
            geo = read_geometry(self.spark, self.path)
        except Exception:  # noqa: BLE001 — missing/unreadable ⇒ stale
            return False
        return int(geo.get("version") or 0) == self.version

    def topk(
        self,
        df: DataFrame,
        query_vec: list[float],
        k: int = 10,
        multiprobe: int = 0,
        multiprobe_bits: int = 1,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k by cosine, scanning only the probed (table, shard)
        directories of the stored index. ``multiprobe``/``bits`` are
        query-time knobs (more stored buckets probed, no reindex).
        Identical results to ``ann_topk_indexed`` by construction
        (pinned in tests): the probed-bucket filter is the same set
        membership the semi-join evaluates, minus the full index scan.
        """
        from pyspark.sql import Window

        from hbacker_spark.functions.similarity import cosine

        geo = self.geometry
        probes = query_probe_buckets(
            query_vec, geo["n_planes"], geo["n_tables"], geo["seed"],
            multiprobe, multiprobe_bits,
        )
        candidate_ids = lsh_probe_scan(self.sigs, probes, geo["n_shards"])
        candidates = df.join(
            candidate_ids, df[id_col] == candidate_ids.vec_id, "left_semi"
        )
        q_df = driver_local_df(self.spark, [(query_vec,)], "q_emb array<float>")
        scored = candidates.crossJoin(F.broadcast(q_df)).select(
            F.col(id_col), F.round(cosine(vec_col, "q_emb"), 6).alias("cos_sim")
        )
        top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
        w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))  # over k rows only
        return top.withColumn("rnk", F.row_number().over(w))


def ann_topk_stored(
    spark: SparkSession,
    df: DataFrame,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe: int = 0,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot convenience over :class:`StoredLshIndex` — opens the
    index (geometry read + directory listing) per call. Serving loops
    should hold a handle instead."""
    return StoredLshIndex(spark, index_path).topk(
        df, query_vec, k, multiprobe, multiprobe_bits, id_col, vec_col
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def build_ivf_index(
    df: DataFrame,
    index_path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    seed: int = SEED,
    train_iters: int = TRAIN_ITERS,
    store_vectors: bool = False,
) -> dict:
    """Train + assign once and persist the IVF index.

    ``n_centroids=None`` auto-sizes (sqrt(n), the production default).
    Assignments land partitioned by ``centroid_id`` — the inverted
    lists ARE directories, so a probe's IO is its ``nprobe`` lists and
    nothing else. The centroid matrix (n_centroids × dim int64 — a few
    KB) is stored as rows; serving collects just that.

    ``store_vectors=True`` stores each vector IN its list row (the
    FAISS IndexIVFFlat shape): serving then answers entirely from the
    probed list directories — zero corpus access per query
    (``StoredIvfIndex.topk(df=None)``) — at the cost of duplicating
    the embedding column into the index. Right when the index serves
    many queries against a corpus that lives elsewhere (or is 100 TB
    of documents whose embedding column alone is worth re-storing
    list-clustered); leave False when corpus and index share storage
    and an id semi-join is acceptable. IVF-only by design: each vector
    sits in exactly ONE list, so storage is x1 — the LSH layout would
    duplicate every vector n_tables times.
    """
    spark = df.sparkSession
    with _mutation_fence(spark, index_path):
        geo = _build_ivf_under_fence(
            df, index_path, dim, id_col, vec_col, n_centroids, seed,
            train_iters, store_vectors,
            version=_next_version(spark, index_path),
        )
    geo["quant"] = QUANT
    return geo


def _build_ivf_under_fence(
    df: DataFrame,
    index_path: str,
    dim: int,
    id_col: str,
    vec_col: str,
    n_centroids: int | None,
    seed: int,
    train_iters: int,
    store_vectors: bool,
    version: int,
    carry: dict | None = None,
) -> dict:
    """Shared IVF build body (caller holds the fence): train + assign
    into the NEXT data version dirs (``assignments/vN``,
    ``centroids/vN`` — same number, one geometry pointer covers both),
    publish via the geometry commit, retire past-grace versions."""
    from hbacker_spark.operators.similarity import _seed_centroids, train_ivf_centroids

    spark = df.sparkSession
    old_dv = _live_data_version(spark, index_path)
    n_rows = df.count()
    if n_centroids is None:
        n_centroids = recommended_centroids(n_rows)
    if train_iters > 0:
        cents = train_ivf_centroids(df, dim, n_centroids, vec_col, seed, n_iter=train_iters)
    else:
        cents = _seed_centroids(dim, n_centroids, seed)
    dv, vdir = storage.begin_version(spark, f"{index_path}/assignments")
    assigned = assign_with_centroids(
        df, cents, id_col, vec_col, include_vec=store_vectors
    )
    (
        assigned.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(vdir)
    )
    cent_rows = [
        (int(j), int(kk), int(cents[j, kk]))
        for j in range(cents.shape[0])
        for kk in range(cents.shape[1])
    ]
    spark.createDataFrame(cent_rows, "j int, k int, c long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(storage.version_dir(f"{index_path}/centroids", dv))
    geo = {
        "kind": "ivf",
        "n_centroids": int(n_centroids),
        "dim": int(dim),
        "seed": int(seed),
        "train_iters": int(train_iters),
        "n_rows": int(n_rows),
        "has_vectors": bool(store_vectors),
        "version": version,
        "data_version": dv,
    }
    geo.update(carry or {})
    _write_geometry(spark, index_path, geo)
    _retire_data_versions(spark, f"{index_path}/assignments", dv, old_dv)
    _retire_data_versions(spark, f"{index_path}/centroids", dv, old_dv)
    return geo


def assign_with_centroids(
    df: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_vec: bool = False,
) -> DataFrame:
    """(vec_id, centroid_id[, embedding]) for ``df`` against a FIXED
    centroid matrix — the assignment half of ivf_assign without the
    training half. Exact integer L2 argmin, ids keep their incoming
    type; ``include_vec`` passes the vector through for
    vector-carrying lists (store_vectors indexes)."""
    import pandas as pd

    from hbacker_spark.operators.similarity import _int_assign, _quantize

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            m_q = _quantize(np.stack(pdf[vec_col].to_numpy()))
            out = {"vec_id": pdf[id_col].to_numpy(), "centroid_id": _int_assign(m_q, cents)}
            if include_vec:
                out["embedding"] = pdf[vec_col]
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"vec_id {id_type}, centroid_id int"
    if include_vec:
        vec_type = df.schema[vec_col].dataType.simpleString()
        schema += f", embedding {vec_type}"
    return df.select(F.col(id_col).alias("vec_id"), F.col(vec_col)).mapInPandas(
        batches, schema=schema
    )


def append_ivf_index(
    df_new: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
    stream_id: str | None = None,
) -> dict:
    """Incremental ingest into a stored IVF index — assign the new
    vectors against the STORED centroids (centroids are deliberately
    NOT retrained: retraining moves list boundaries, which would strand
    every already-stored assignment — the standard IVF ingest contract;
    FAISS's add-without-train shape). Assignment against fixed
    centroids is a pure per-row function, so appended rows equal what a
    fixed-centroid rebuild over old∪new would assign (pinned in tests).
    Distribution drift is :func:`index_health`'s job: when the corpus
    outgrows sqrt(n) centroids (or shifts), rebuild. Same single-writer
    and stream-scoped ``batch_id`` replay-idempotency contract as
    :func:`append_lsh_index`."""
    spark = df_new.sparkSession
    with _mutation_fence(spark, index_path, wait_s=INDEX_APPEND_WAIT_S):
        geo = read_geometry(spark, index_path)
        if geo["kind"] != "ivf":
            raise IndexGeometryError(f"index at {index_path} is {geo['kind']!r}, not ivf")
        if (
            batch_id is not None
            and geo["last_batch_id"] is not None
            and geo["last_stream_id"] == stream_id
            and batch_id <= geo["last_batch_id"]
        ):
            return geo  # replayed micro-batch of THIS stream: already folded
        cents = np.zeros((geo["n_centroids"], geo["dim"]), dtype=np.int64)
        for r in spark.read.parquet(index_data_dir(index_path, geo, "centroids")).collect():
            cents[r["j"], r["k"]] = r["c"]
        n_new = df_new.count()
        # a vector-carrying index stays vector-carrying across appends
        assigned = assign_with_centroids(
            df_new, cents, id_col, vec_col, include_vec=bool(geo["has_vectors"])
        )
        (
            assigned.repartition("centroid_id")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(index_data_dir(index_path, geo))
        )
        geo["n_rows"] = int(geo["n_rows"] or 0) + n_new
        if batch_id is not None:
            geo["last_batch_id"] = int(batch_id)
            geo["last_stream_id"] = stream_id
        _write_geometry(spark, index_path, geo)
    return geo


def index_ingest_stream(batches: DataFrame, index_path: str, checkpoint: str,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        allow_rebase: bool = False):
    """Streaming ingest into a STORED index — the foreachBatch driver
    unifying the incremental state story (operators/incremental.py)
    with stored serving: each micro-batch hashes/assigns only its own
    vectors under the stored geometry and appends into the partition
    layout queries already probe. Dispatches on the index's stored
    ``kind``, so one driver serves both families.

    The index must exist (build_lsh_index / build_ivf_index at
    bootstrap — streaming cannot auto-size geometry from a first
    micro-batch, and IVF needs trained centroids). Replay safety:
    foreachBatch is at-least-once; the append skips any batch_id at or
    below the geometry's ``last_batch_id`` — scoped by the CHECKPOINT
    location as the stream identity, because batch ids restart at 0
    under a fresh checkpoint and an unscoped guard would silently drop
    a new stream's every batch as a stale replay. The residual
    committed-append/uncommitted-geometry crash window costs duplicate
    rows only — results are set-reduced at serve time and
    :func:`compact_index` reclaims the space (contract documented on
    :func:`append_lsh_index`). Empty batches are the identity and skip
    the fold. Returns the StreamingQuery (caller awaits termination).

    Rebase guard (VERDICT r10 #5): pointing a FRESH checkpoint at an
    index another stream has already fed re-folds correctly only by
    luck — the new stream's batch 0 may replay source rows the old
    stream already ingested, and the batch-id watermark (correctly)
    resets with the new stream identity. The geometry remembers its
    feeding stream (``last_stream_id``); a DIFFERENT checkpoint now
    raises loudly unless ``allow_rebase=True``, which declares "this
    is deliberately a new source epoch over this index" and bumps the
    geometry's ``ingest_epoch`` so the handover is auditable. The
    blessed path — resuming the SAME checkpoint — is unchanged and
    needs no flag."""
    spark = batches.sparkSession
    geo = read_geometry(spark, index_path)
    kind = geo["kind"]
    prior_stream = geo.get("last_stream_id")
    if prior_stream is not None and prior_stream != checkpoint:
        if not allow_rebase:
            raise IndexContentionError(
                f"index at {index_path} was last fed by stream checkpoint "
                f"{prior_stream!r}; starting a NEW checkpoint "
                f"({checkpoint!r}) would reset the replay watermark and can "
                f"double-ingest rows the old stream already folded. Resume "
                f"the original checkpoint, or pass allow_rebase=True to "
                f"declare a deliberate new source epoch "
                f"(ingest_epoch={int(geo.get('ingest_epoch') or 0)})."
            )
        with _mutation_fence(spark, index_path, wait_s=INDEX_APPEND_WAIT_S):
            geo = read_geometry(spark, index_path)  # re-read under the fence
            if geo.get("last_stream_id") != prior_stream:
                # ADVICE r11: the unfenced pre-check and this fenced
                # re-read disagree — ANOTHER new stream rebased the index
                # in the window, and silently overwriting its identity/
                # watermark would let two fresh streams double-feed. The
                # second rebaser loses, loudly.
                raise IndexContentionError(
                    f"index at {index_path} was rebased by a concurrent "
                    f"stream ({geo.get('last_stream_id')!r}) while this "
                    f"rebase (checkpoint {checkpoint!r}) awaited the fence "
                    f"— re-examine which stream should own the index and "
                    f"retry deliberately."
                )
            geo["ingest_epoch"] = int(geo.get("ingest_epoch") or 0) + 1
            geo["last_stream_id"] = checkpoint
            geo["last_batch_id"] = None  # new identity, fresh watermark
            _write_geometry(spark, index_path, geo)
    append = append_lsh_index if kind == "lsh" else append_ivf_index

    def fold(batch_df: DataFrame, bid: int) -> None:
        if not batch_df.head(1):
            return
        append(batch_df, index_path, id_col, vec_col,
               batch_id=bid, stream_id=checkpoint)

    return (
        batches.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_index(spark: SparkSession, index_path: str) -> dict:
    """Collapse an append chain's file fragmentation — the maintenance
    twin of compact_snapshot for index dirs.

    Every :func:`append_lsh_index` / :func:`append_ivf_index` batch
    adds one file per touched partition directory, so a K-batch ingest
    chain leaves up to K files per directory; probe reads then pay K
    footer reads + K row-group seeks per probed dir. This rewrites the
    index relation into one file per partition directory (re-sorted by
    bucket for LSH, so row-group pruning is restored too) as a NEW data
    version published by the geometry commit (VERDICT r10 #1 — one
    atomic cutover, no rename-over-live-data), and returns before/after
    file counts. Geometry row counts are unchanged and results are
    byte-identical by construction (pinned in tests), but the geometry
    ``version`` bumps; the PREVIOUS data version survives one further
    swap for in-flight readers, after which a stale handle's queries
    fail LOUDLY (FileNotFound) instead of returning silently wrong
    rows — reopen the handle (handles serve a snapshot as-of open;
    ``is_current()`` probes, wait-free). Runs under the per-index
    mutation fence (VERDICT r9 #6), so a racing ingest append waits it
    out instead of losing rows under the cutover. Run it when file
    counts per dir grow past a handful, same cadence discipline as
    snapshot compaction."""
    with _mutation_fence(spark, index_path):
        geo = read_geometry(spark, index_path)
        sub, sort_col, part_cols = _layout(geo)
        old_dir = index_data_dir(index_path, geo)
        _, before = storage.leaf_dir_stats(spark, old_dir)
        # dropDuplicates repairs the streaming replay window (a
        # committed-append/uncommitted-geometry crash double-appends a
        # batch): index rows are deterministic per (vector, geometry), so
        # exact duplicates carry zero information — serving already
        # set-reduces them; compaction reclaims the bytes.
        dv, vdir = storage.begin_version(spark, f"{index_path}/{sub}")
        df = spark.read.parquet(old_dir).dropDuplicates().repartition(*part_cols)
        if sort_col:
            df = df.sortWithinPartitions(sort_col)
        df.write.mode("overwrite").partitionBy(*part_cols).parquet(vdir)
        if geo["kind"] == "ivf":
            _carry_centroids(spark, index_path, geo, dv)
        old_dv = geo.get("data_version")
        geo["version"] = int(geo.get("version") or 0) + 1
        geo["data_version"] = dv
        _write_geometry(spark, index_path, geo)
        _retire_data_versions(spark, f"{index_path}/{sub}", dv, old_dv)
        if geo["kind"] == "ivf":
            _retire_data_versions(spark, f"{index_path}/centroids", dv, old_dv)
        _, after = storage.leaf_dir_stats(spark, vdir)
    return {"kind": geo["kind"], "files_before": before, "files_after": after}


def _carry_centroids(spark: SparkSession, index_path: str, geo: dict, dv: int) -> None:
    """Copy the (tiny — n_centroids x dim rows) centroid matrix forward
    into data version ``dv`` so assignments and centroids always move in
    lockstep under one geometry pointer."""
    cents = spark.read.parquet(index_data_dir(index_path, geo, "centroids"))
    cents.coalesce(1).write.mode("overwrite").parquet(
        storage.version_dir(f"{index_path}/centroids", dv)
    )


def scrub_index(
    spark: SparkSession,
    index_path: str,
    forget_ids: DataFrame,
    purge: bool = False,
) -> dict:
    """Right-to-be-forgotten for a stored ANN index — the companion to
    maintenance.scrub_snapshot: a compliance deletion that scrubs the
    corpus MUST also scrub the indexes built over it, or the forgotten
    vectors keep surfacing as ANN candidates (and, for vector-carrying
    IVF lists, the embedding itself remains readable from the index).

    Broadcast left_anti against the forget list (small relative to the
    index at any scale), rewritten as a new data version published by
    the geometry commit, same as :func:`compact_index` — one scan, no
    shuffle of the kept data beyond the partition repartition, atomic
    cutover, bucket sort restored for LSH.

    RTBF physical deletion (VERDICT r11 #5 / ADVICE r11): by default
    the previous data version (still holding the forgotten rows)
    survives as the readers' grace copy until a later mutation retires
    it — fine for an internal cleanup, NOT for a compliance deadline.
    ``purge=True`` retires every superseded data version (and the
    superseded geometry version) IMMEDIATELY after the scrub commits,
    overriding both the grace count and the retention TTL: the
    forgotten ids' bytes are gone from disk when the call returns.
    In-flight readers of the purged copy fail loudly (FileNotFound) —
    invalidating them is the desired behavior for a forced deletion;
    the scrub holds the single-writer fence throughout, so no fence
    waiter can be mid-mutation on the purged version.

    ``n_rows`` decrements by the DISTINCT ids actually removed —
    counted directly (semi-join + countDistinct), never derived from
    raw row deltas (ADVICE r9): the replay crash window can leave
    duplicate rows for a forgotten id, and a row-delta division by
    rows_per_vec would overcount, over-decrementing geometry n_rows
    and skewing index_health's reindex recommendation. Swap + fence +
    version-bump contract identical to :func:`compact_index` (stale
    handles fail loudly; racing appends wait out the fence). Returns
    {kind, rows_before, rows_after, ids_removed, purged}.
    """
    with _mutation_fence(spark, index_path):
        geo = read_geometry(spark, index_path)
        sub, sort_col, part_cols = _layout(geo)
        old_dir = index_data_dir(index_path, geo)
        df = spark.read.parquet(old_dir)
        before = df.count()
        keys = forget_ids.select(F.col(forget_ids.columns[0]).alias("vec_id")).distinct()
        removed_ids = int(
            df.join(F.broadcast(keys), "vec_id", "left_semi")
            .agg(F.countDistinct("vec_id"))
            .first()[0]
        )
        dv, vdir = storage.begin_version(spark, f"{index_path}/{sub}")
        kept = df.join(F.broadcast(keys), "vec_id", "left_anti").repartition(*part_cols)
        if sort_col:
            kept = kept.sortWithinPartitions(sort_col)
        kept.write.mode("overwrite").partitionBy(*part_cols).parquet(vdir)
        if geo["kind"] == "ivf":
            _carry_centroids(spark, index_path, geo, dv)
        after = spark.read.parquet(vdir).count()
        old_dv = geo.get("data_version")
        geo["n_rows"] = max(0, int(geo["n_rows"] or 0) - removed_ids)
        geo["version"] = int(geo.get("version") or 0) + 1
        geo["data_version"] = dv
        _write_geometry(spark, index_path, geo, purge=purge)
        _retire_data_versions(
            spark, f"{index_path}/{sub}", dv, old_dv, purge=purge
        )
        if geo["kind"] == "ivf":
            _retire_data_versions(
                spark, f"{index_path}/centroids", dv, old_dv, purge=purge
            )
    return {
        "kind": geo["kind"],
        "rows_before": before,
        "rows_after": after,
        "ids_removed": removed_ids,
        "purged": bool(purge),
    }


def index_health(spark: SparkSession, index_path: str) -> dict:
    """Is the stored geometry still right for the corpus it now holds?

    Appends keep the build-time geometry (they must — the stored rows
    were hashed/assigned under it), so a long-running ingest chain
    eventually outgrows it: LSH buckets densify past the hot-bucket
    cap, IVF lists coarsen past the sqrt(n) balance. This is the
    measured x100 failure mode (X100_RECEIPT.json: pinned planes at
    100x capacity → 44.5GB spill; pinned 16 centroids → recall
    0.637→0.562). Returns the stored vs recommended geometry and
    ``reindex_recommended`` — cheap (reads one geometry row and lists
    the partition dirs, zero data scans), so run it per ingest batch.
    Until a rebuild lands, the query-time mitigations need no reindex:
    ``multiprobe``/``bits`` for LSH, ``nprobe`` for IVF.

    Also accounts append fragmentation (files vs partition dirs — each
    append adds one file per touched dir) and recommends
    :func:`compact_index` past ~4 files/dir, so the compact cadence is
    data-driven instead of guessed. Listing goes through the Hadoop
    FileSystem API (ADVICE r9) — health checks work on any scheme the
    index lives on. When the corpus HAS outgrown the geometry,
    :func:`rebuild_index` is the remediation (re-plane/re-centroid at
    auto sizing, atomic swap)."""
    geo = read_geometry(spark, index_path)
    n = int(geo["n_rows"] or 0)
    out = {
        "kind": geo["kind"],
        "n_rows": n,
        "version": int(geo.get("version") or 0),
        # streaming-ingest audit (VERDICT r11 #7): which checkpoint fed
        # this index, its replay watermark, and how many deliberate
        # source-epoch rebases it has absorbed (index_ingest_stream's
        # allow_rebase bumps ingest_epoch) — health is where an operator
        # looks first, so the rebase trail must be visible here, not
        # only in the raw geometry row
        "ingest_epoch": int(geo.get("ingest_epoch") or 0),
        "last_stream_id": geo.get("last_stream_id"),
        "last_batch_id": geo.get("last_batch_id"),
    }
    n_dirs, n_files = storage.leaf_dir_stats(spark, index_data_dir(index_path, geo))
    out |= {
        "partition_dirs": n_dirs,
        "data_files": n_files,
        "compact_recommended": n_dirs > 0 and n_files > 4 * n_dirs,
    }
    if geo["kind"] == "lsh":
        rec = recommended_planes(n)
        out |= {
            "stored_planes": geo["n_planes"],
            "recommended_planes": rec,
            "reindex_recommended": rec > geo["n_planes"],
        }
    else:
        rec = recommended_centroids(n)
        out |= {
            "stored_centroids": geo["n_centroids"],
            "recommended_centroids": rec,
            # sqrt(n) drifts continuously; re-list only past 2x to keep
            # rebuild cadence O(log n) over an append chain
            "reindex_recommended": rec > 2 * geo["n_centroids"],
        }
    return out


def maintain_index(
    spark: SparkSession,
    index_path: str,
    df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Apply :func:`index_health`'s own recommendations (VERDICT r10
    #4) — the cron-able maintenance entry point a real deployment
    needs, instead of an operator reading health output and choosing
    by hand.

    Policy, in priority order: ``reindex_recommended`` (geometry
    drift) → :func:`rebuild_index`, which ALSO clears fragmentation —
    a rebuild rewrites the whole index at one file per partition dir,
    so running compact first would be a wasted full pass at 100 TB;
    else ``compact_recommended`` (append fragmentation) →
    :func:`compact_index`; else no-op — a second call right after a
    maintain is the identity, so the cron cadence needs no external
    state. Each applied action is fence-serialized by the op itself
    (racing ingest appends wait it out) and preserves the streaming
    replay watermark (rebuild carries it; compact never touches it).

    ``df`` is the corpus, needed only when a rebuild fires on an LSH
    index (or a vector-less IVF index) — exactly
    :func:`rebuild_index`'s contract; passing it when no rebuild is
    needed costs nothing (the plan is never executed). Returns
    ``{actions, health_before, health_after}``."""
    before = index_health(spark, index_path)
    actions: list[str] = []
    if before["reindex_recommended"]:
        rebuild_index(spark, index_path, df, id_col=id_col, vec_col=vec_col)
        actions.append("rebuild")
    elif before["compact_recommended"]:
        compact_index(spark, index_path)
        actions.append("compact")
    after = index_health(spark, index_path) if actions else before
    return {"actions": actions, "health_before": before, "health_after": after}


def rebuild_index(
    spark: SparkSession,
    index_path: str,
    df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Geometry-drift remediation (VERDICT r9 #3): re-plane /
    re-centroid a stored index at AUTO sizing for the corpus it now
    holds, built BESIDE the live index and atomically swapped in (the
    compact_index pattern) — the production answer when
    :func:`index_health` says ``reindex_recommended``.

    Appends deliberately keep the build-time geometry (stored rows
    were hashed/assigned under it), so a long ingest chain outgrows
    it; until now the remediation was a manual build-new + repoint.
    This rebuilds under the SAME kind/seed/tables/shards/train_iters
    but auto-sized planes (LSH) or centroids (IVF), preserving the
    streaming replay watermark (``last_batch_id``/``last_stream_id``)
    so an ingest stream resumes against the rebuilt index without
    re-folding replayed batches.

    Corpus source: LSH indexes store no vectors, so ``df`` (the
    corpus) is REQUIRED; an IVF index built with ``store_vectors=True``
    rebuilds from its own lists when ``df=None`` (replay-window
    duplicate rows are dropped by vec_id first).

    Concurrency: the whole rebuild holds the per-index mutation fence
    — a racing ingest append sleep-polls (INDEX_APPEND_WAIT_S, 10 min)
    and then folds under the REBUILT geometry (it reads geometry only
    after acquiring the fence), so ingest streams ride out a routine
    rebuild with no pause; a rebuild longer than the append bound
    surfaces as a loud IndexContentionError on the ingest side rather
    than rows silently lost under the swap.

    r11 cutover: the rebuild writes a NEW data version under the SAME
    index root and publishes it with the geometry commit — the
    pre-r11 root rename (with its reader window where ``index_path``
    momentarily did not exist, and its copy-cost on object stores) is
    gone. Open handles keep serving the PREVIOUS data version (kept
    as the grace copy) and go stale loudly only after the NEXT
    mutation retires it; ``handle.is_current()`` probes the geometry
    ``version`` bump wait-free.
    """
    with _mutation_fence(spark, index_path):
        geo = read_geometry(spark, index_path)
        carry = {
            "version": int(geo.get("version") or 0) + 1,
            "last_batch_id": geo.get("last_batch_id"),
            "last_stream_id": geo.get("last_stream_id"),
            "ingest_epoch": int(geo.get("ingest_epoch") or 0),
        }
        if geo["kind"] == "lsh":
            if df is None:
                raise ValueError(
                    "LSH rebuild needs the corpus df — signature rows "
                    "store no vectors (an IVF index built with "
                    "store_vectors=True can rebuild corpus-free)"
                )
            new_geo = _build_lsh_under_fence(
                df, index_path, id_col, vec_col, n_planes=None,
                n_tables=geo["n_tables"], seed=geo["seed"],
                n_shards=geo["n_shards"], version=carry["version"], carry=carry,
            )
        else:
            if df is None:
                if not geo["has_vectors"]:
                    raise IndexGeometryError(
                        f"index at {index_path} stores no vectors (built "
                        f"with store_vectors=False) — pass the corpus df "
                        f"to rebuild"
                    )
                df = (
                    spark.read.parquet(index_data_dir(index_path, geo))
                    .select("vec_id", "embedding")
                    .dropDuplicates(["vec_id"])
                )
                id_col, vec_col = "vec_id", "embedding"
            new_geo = _build_ivf_under_fence(
                df, index_path, geo["dim"], id_col, vec_col,
                n_centroids=None, seed=geo["seed"],
                train_iters=geo["train_iters"],
                store_vectors=bool(geo["has_vectors"]),
                version=carry["version"], carry=carry,
            )
    new_geo["quant"] = QUANT
    return new_geo


def read_ivf_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, np.ndarray, dict]:
    """(assignments, centroid matrix, geometry) of a stored IVF index.
    The centroid collect is n_centroids·dim rows — metadata-sized."""
    geo = read_geometry(spark, index_path)
    if geo["kind"] != "ivf":
        raise IndexGeometryError(f"index at {index_path} is {geo['kind']!r}, not ivf")
    assigned = spark.read.parquet(index_data_dir(index_path, geo))
    cents = np.zeros((geo["n_centroids"], geo["dim"]), dtype=np.int64)
    for r in spark.read.parquet(index_data_dir(index_path, geo, "centroids")).collect():
        cents[r["j"], r["k"]] = r["c"]
    return assigned, cents, geo


class StoredIvfIndex:
    """Open-once/query-many handle for a stored IVF index: the
    geometry + centroid-matrix reads and the list-directory listing
    happen at open; every query is a driver-side probe ranking over
    the in-memory centroids plus a partition-pruned scan of the nprobe
    probed list directories (same rationale — and the same
    snapshot-as-of-open read contract, loud FileNotFound on stale
    handles after compact/scrub/rebuild, ``is_current()`` probe — as
    :class:`StoredLshIndex`)."""

    def __init__(self, spark: SparkSession, index_path: str):
        self.spark = spark
        self.path = index_path
        self.assigned, self.cents, self.geometry = read_ivf_index(spark, index_path)
        self.version = int(self.geometry.get("version") or 0)

    def is_current(self) -> bool:
        """False once a compact/scrub/rebuild has superseded the files
        this handle serves from (geometry version advanced) — reopen.
        Never raises (ADVICE r10) — see :meth:`StoredLshIndex.is_current`."""
        try:
            geo = read_geometry(self.spark, self.path)
        except Exception:  # noqa: BLE001 — missing/unreadable ⇒ stale
            return False
        return int(geo.get("version") or 0) == self.version

    def topk(
        self,
        df: DataFrame | None,
        query_vec: list[float],
        k: int = 10,
        nprobe: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k by cosine over the probed lists. The ``centroid_id IN
        probes`` filter is a pure partition-column literal → the scan's
        PartitionFilters prune to the nprobe list directories.
        Identical results to ``ivf_topk_indexed`` over the same index
        by construction (pinned in tests). ``nprobe=None`` sizes from
        the stored centroid count (25% scan fraction).

        ``df=None`` is INDEX-ONLY serving, available when the index
        was built with ``store_vectors=True``: the probed list rows
        carry their vectors, so the whole query — probe ranking,
        candidate read, exact rerank — touches only the nprobe list
        directories and never the corpus (zero corpus files in the
        plan, asserted in tests). Returns (vec_id, cos_sim, rnk)."""
        from pyspark.sql import Window

        from hbacker_spark.functions.similarity import cosine

        if nprobe is None:
            nprobe = recommended_nprobe(self.geometry["n_centroids"])
        if df is not None:
            return ivf_topk_indexed(
                self.spark, df, self.assigned, self.cents, query_vec, k=k,
                nprobe=nprobe, id_col=id_col, vec_col=vec_col,
            )
        if not self.geometry["has_vectors"]:
            raise IndexGeometryError(
                f"index at {self.path} stores no vectors (built with "
                f"store_vectors=False) — pass the corpus df, or rebuild "
                f"with store_vectors=True for index-only serving"
            )
        from hbacker_spark.operators.similarity import rank_probe_lists

        probe = rank_probe_lists(self.cents, query_vec, nprobe)
        cand = self.assigned.filter(F.col("centroid_id").isin(probe))
        q_df = driver_local_df(self.spark, [(query_vec,)], "q_emb array<float>")
        scored = cand.crossJoin(F.broadcast(q_df)).select(
            F.col("vec_id"),
            F.round(cosine("embedding", "q_emb"), 6).alias("cos_sim"),
        )
        top = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)
        w = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))  # over k rows only
        return top.withColumn("rnk", F.row_number().over(w))


def ivf_topk_stored(
    spark: SparkSession,
    df: DataFrame,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot convenience over :class:`StoredIvfIndex` — opens the
    index per call. Serving loops should hold a handle instead."""
    return StoredIvfIndex(spark, index_path).topk(
        df, query_vec, k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    )
