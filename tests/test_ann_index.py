"""Persisted ANN index storage: build-at-ingest / serve-from-storage.

What these pin (operators/ann_index.py):
- stored-index serving returns EXACTLY the in-memory serving forms'
  results (which themselves pin the per-call forms) — three forms, one
  answer;
- probe-time IO is provably pruned: the LSH probe scan plans
  PartitionFilters over (table_idx, shard) and the IVF probe scan over
  centroid_id — directory pruning visible in the physical plan, the
  property that makes a stored query O(probed lists) at 100 TB;
- geometry travels WITH the index: serving reads it from storage, a
  kind/quant mismatch raises instead of silently mis-probing;
- ids keep their incoming type through ivf_assign (the lsh_signatures
  ADVICE-r3 class — a hardcoded long schema corrupts string ids).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbacker_spark.operators.ann_index import (
    IndexGeometryError,
    ann_topk_stored,
    build_ivf_index,
    build_lsh_index,
    index_data_dir,
    ivf_topk_stored,
    lsh_probe_scan,
    read_geometry,
    read_ivf_index,
)
from hbacker_spark.operators.similarity import (
    DEFAULT_PLANES,
    ann_topk_indexed,
    ivf_assign,
    ivf_topk_indexed,
    lsh_signatures,
    query_probe_buckets,
)
from hbacker_spark.plans import explain as X
from hbacker_spark.sources.tables import load_table

def _ddir(spark, index_path: str) -> str:
    """Current data dir of a stored index (r11 versioned layout): the
    geometry's data_version IS the pointer, so tests resolve through it
    exactly like serving does."""
    return index_data_dir(index_path, read_geometry(spark, index_path))


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, "/root/testdata/sf0.01", "embeddings")


@pytest.fixture(scope="module")
def qvec(embeddings):
    return list(embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[0])


def _rows(df):
    return [tuple(r) for r in df.orderBy("rnk").collect()]


def test_lsh_stored_matches_in_memory_and_prunes(spark, embeddings, qvec, tmp_path):
    path = str(tmp_path / "lsh_idx")
    geo = build_lsh_index(
        embeddings, path, n_planes=DEFAULT_PLANES, n_shards=8
    )
    assert geo["kind"] == "lsh" and geo["n_planes"] == DEFAULT_PLANES

    sigs = lsh_signatures(embeddings, n_planes=DEFAULT_PLANES)
    for mp, bits in ((0, 1), (2, 1), (8, 2)):
        stored = ann_topk_stored(
            spark, embeddings, path, qvec, k=10, multiprobe=mp, multiprobe_bits=bits
        )
        in_mem = ann_topk_indexed(
            spark, embeddings, sigs, qvec, k=10,
            n_planes=DEFAULT_PLANES, multiprobe=mp, multiprobe_bits=bits,
        )
        assert _rows(stored) == _rows(in_mem), (mp, bits)

    # the probed slice plans directory pruning: PartitionFilters over
    # (table_idx, shard), and the residual bucket membership stays a
    # data filter under it
    probes = query_probe_buckets(qvec, DEFAULT_PLANES)
    scan = lsh_probe_scan(
        spark.read.parquet(_ddir(spark, path)), probes, geo["n_shards"]
    )
    plan = X.explain_str(scan)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and any("shard" in l and "table_idx" in l for l in part_lines), plan


def test_ivf_stored_matches_in_memory_and_prunes(spark, embeddings, qvec, tmp_path):
    path = str(tmp_path / "ivf_idx")
    geo = build_ivf_index(
        embeddings, path, dim=len(qvec), n_centroids=16, train_iters=3
    )
    assert geo["kind"] == "ivf" and geo["n_centroids"] == 16

    assigned_mem, cents_mem = ivf_assign(
        embeddings, n_centroids=16, dim=len(qvec), train_iters=3
    )
    in_mem = ivf_topk_indexed(
        spark, embeddings, assigned_mem, cents_mem, qvec, k=10, nprobe=4
    )
    stored = ivf_topk_stored(spark, embeddings, path, qvec, k=10, nprobe=4)
    assert _rows(stored) == _rows(in_mem)

    # stored centroids round-trip bit-exactly (int64 fixed-point)
    _, cents_stored, _ = read_ivf_index(spark, path)
    assert (cents_stored == cents_mem).all()

    # the assignment scan prunes to the probed list directories
    assigned = spark.read.parquet(_ddir(spark, path))
    probe_scan = assigned.filter(F.col("centroid_id").isin([0, 3, 7, 11]))
    plan = X.explain_str(probe_scan)
    assert any(
        "PartitionFilters" in l and "centroid_id" in l for l in plan.splitlines()
    ), plan


def test_geometry_travels_with_index(spark, embeddings, qvec, tmp_path):
    """Serving must take geometry from storage, not the caller: an
    index built at a non-default geometry answers correctly with no
    geometry arguments at query time; kind mismatches raise."""
    path = str(tmp_path / "lsh_idx9")
    build_lsh_index(embeddings, path, n_planes=9, n_shards=4)
    geo = read_geometry(spark, path)
    assert geo["n_planes"] == 9

    sigs = lsh_signatures(embeddings, n_planes=9)
    stored = ann_topk_stored(spark, embeddings, path, qvec, k=10, multiprobe=4)
    in_mem = ann_topk_indexed(
        spark, embeddings, sigs, qvec, k=10, n_planes=9, multiprobe=4
    )
    assert _rows(stored) == _rows(in_mem)

    with pytest.raises(IndexGeometryError, match="not ivf"):
        ivf_topk_stored(spark, embeddings, path, qvec)

    ivf_path = str(tmp_path / "ivf_small")
    build_ivf_index(embeddings.limit(64), ivf_path, dim=len(qvec), n_centroids=4)
    with pytest.raises(IndexGeometryError, match="not lsh"):
        ann_topk_stored(spark, embeddings, ivf_path, qvec)


def test_ivf_assign_keeps_id_type(spark, embeddings):
    """ADVICE-r3 class regression: ivf_assign must follow the incoming
    id type (it hardcoded `vec_id long` until r9, silently corrupting
    string ids the way lsh_signatures once did)."""
    tagged = embeddings.limit(50).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    assigned, _ = ivf_assign(tagged, n_centroids=4, dim=64, train_iters=0)
    assert assigned.schema["vec_id"].dataType.simpleString() == "string"
    ids = {r["vec_id"] for r in assigned.collect()}
    assert len(ids) == 50 and all(i.startswith("doc-") for i in ids)


def test_lsh_append_equals_rebuild(spark, embeddings, qvec, tmp_path):
    """Incremental stored-index ingest: build on the first half, append
    the second half → the stored signature SET (and therefore every
    stored query) must equal a full rebuild over the union. Signatures
    are a pure per-row function of the stored geometry, so this is the
    fold==rebuild contract of the incremental state algebras applied to
    the storage layer."""
    from hbacker_spark.operators.ann_index import append_lsh_index, index_health

    old = embeddings.filter(F.col("vec_id") % 2 == 0)
    new = embeddings.filter(F.col("vec_id") % 2 == 1)

    inc_path = str(tmp_path / "lsh_inc")
    build_lsh_index(old, inc_path, n_planes=DEFAULT_PLANES, n_shards=8)
    geo = append_lsh_index(new, inc_path)
    assert geo["n_rows"] == embeddings.count()

    full_path = str(tmp_path / "lsh_full")
    build_lsh_index(embeddings, full_path, n_planes=DEFAULT_PLANES, n_shards=8)

    inc_sigs = spark.read.parquet(_ddir(spark, inc_path))
    full_sigs = spark.read.parquet(_ddir(spark, full_path))
    assert sorted(map(tuple, inc_sigs.collect())) == sorted(map(tuple, full_sigs.collect()))

    stored = ann_topk_stored(spark, embeddings, inc_path, qvec, k=10, multiprobe=2)
    rebuilt = ann_topk_stored(spark, embeddings, full_path, qvec, k=10, multiprobe=2)
    assert _rows(stored) == _rows(rebuilt)

    # health: the appended corpus still fits 6 planes at this SF; a
    # simulated 100x n_rows flips reindex_recommended
    h = index_health(spark, inc_path)
    assert h["kind"] == "lsh" and h["stored_planes"] == DEFAULT_PLANES
    # fragmentation accounting: the 1-append chain has >= dirs files,
    # and a clean build compacts to exactly one file per dir
    assert h["data_files"] >= h["partition_dirs"] > 0
    h_full = index_health(spark, full_path)
    assert h_full["data_files"] == h_full["partition_dirs"]
    assert h_full["compact_recommended"] is False
    from hbacker_spark.operators.ann_index import _write_geometry, read_geometry

    big = read_geometry(spark, inc_path) | {"n_rows": 2_000_000}
    _write_geometry(spark, inc_path, big)
    assert index_health(spark, inc_path)["reindex_recommended"]


def test_ivf_append_equals_fixed_centroid_rebuild(spark, embeddings, qvec, tmp_path):
    """IVF append assigns new vectors against the STORED centroids (no
    retrain — retraining would strand stored assignments). The appended
    assignment set must equal assigning the union against those same
    centroids, and stored queries must match."""
    from hbacker_spark.operators.ann_index import (
        append_ivf_index,
        assign_with_centroids,
        index_health,
    )

    old = embeddings.filter(F.col("vec_id") % 2 == 0)
    new = embeddings.filter(F.col("vec_id") % 2 == 1)

    path = str(tmp_path / "ivf_inc")
    build_ivf_index(old, path, dim=len(qvec), n_centroids=8, train_iters=2)
    geo = append_ivf_index(new, path)
    assert geo["n_rows"] == embeddings.count()

    assigned, cents, _ = read_ivf_index(spark, path)
    expect = assign_with_centroids(embeddings, cents)
    assert sorted(map(tuple, assigned.collect())) == sorted(map(tuple, expect.collect()))

    stored = ivf_topk_stored(spark, embeddings, path, qvec, k=10, nprobe=3)
    via_mem = ivf_topk_indexed(spark, embeddings, expect, cents, qvec, k=10, nprobe=3)
    assert _rows(stored) == _rows(via_mem)

    h = index_health(spark, path)
    assert h["kind"] == "ivf" and h["stored_centroids"] == 8
    from hbacker_spark.operators.similarity import recommended_centroids

    assert h["reindex_recommended"] == (
        recommended_centroids(embeddings.count()) > 2 * 8
    )


def test_compact_index_collapses_append_fragmentation(spark, embeddings, qvec, tmp_path):
    """A 3-batch append chain leaves multiple files per partition dir;
    compaction collapses to one file per dir, restores bucket sort, and
    changes nothing about results (same rows, same stored queries)."""
    from hbacker_spark.operators.ann_index import append_lsh_index, compact_index

    thirds = [embeddings.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    path = str(tmp_path / "lsh_frag")
    build_lsh_index(thirds[0], path, n_planes=DEFAULT_PLANES, n_shards=4)
    append_lsh_index(thirds[1], path)
    append_lsh_index(thirds[2], path)

    before = ann_topk_stored(spark, embeddings, path, qvec, k=10, multiprobe=2)
    before_rows = _rows(before)
    sig_rows = sorted(map(tuple, spark.read.parquet(_ddir(spark, path)).collect()))

    stats = compact_index(spark, path)
    assert stats["files_before"] > stats["files_after"], stats
    # one file per (table_idx, shard) directory after compaction
    import os

    ddir = _ddir(spark, path)
    for t in os.listdir(ddir):
        if not t.startswith("table_idx="):
            continue
        for s in os.listdir(f"{ddir}/{t}"):
            if s.startswith("shard="):
                pq = [f for f in os.listdir(f"{ddir}/{t}/{s}") if f.endswith(".parquet")]
                assert len(pq) == 1, (t, s, pq)

    assert sorted(map(tuple, spark.read.parquet(_ddir(spark, path)).collect())) == sig_rows
    assert _rows(ann_topk_stored(spark, embeddings, path, qvec, k=10, multiprobe=2)) == before_rows


def test_index_ingest_stream_equals_rebuild_with_restart(spark, embeddings, qvec, tmp_path):
    """Streaming ingest into the STORED index (foreachBatch → append
    under the stored geometry, incl. a restart between drains)
    maintains the same signature set a full rebuild produces — the
    stream==batch contract extended to the storage layer. Replay
    idempotency: re-appending an already-folded batch_id is a no-op."""
    from hbacker_spark.operators.ann_index import (
        append_lsh_index,
        index_ingest_stream,
        read_geometry,
    )

    bucket = F.pmod(F.xxhash64("vec_id", F.lit(7)), F.lit(3))
    boot = embeddings.filter(bucket == 0)
    path = str(tmp_path / "lsh_stream")
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    build_lsh_index(boot, path, n_planes=DEFAULT_PLANES, n_shards=8)
    schema = embeddings.schema

    def drain():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        q = index_ingest_stream(stream, path, ckpt)
        q.awaitTermination()

    embeddings.filter(bucket == 1).coalesce(1).write.mode("append").parquet(src)
    drain()
    embeddings.filter(bucket == 2).coalesce(1).write.mode("append").parquet(src)
    drain()  # restarted query folds only the new file

    full_path = str(tmp_path / "lsh_full")
    build_lsh_index(embeddings, full_path, n_planes=DEFAULT_PLANES, n_shards=8)
    got = sorted(map(tuple, spark.read.parquet(_ddir(spark, path)).collect()))
    want = sorted(map(tuple, spark.read.parquet(_ddir(spark, full_path)).collect()))
    assert got == want

    geo = read_geometry(spark, path)
    assert geo["n_rows"] == embeddings.count()
    assert geo["last_batch_id"] is not None

    # replayed batch_id of the SAME stream (checkpoint) → no-op
    n_sig = spark.read.parquet(_ddir(spark, path)).count()
    replay = append_lsh_index(
        embeddings.limit(10), path, batch_id=geo["last_batch_id"], stream_id=ckpt
    )
    assert replay["n_rows"] == geo["n_rows"]
    assert spark.read.parquet(_ddir(spark, path)).count() == n_sig

    # a NEW stream's batch 0 must NOT be treated as a stale replay:
    # Structured Streaming restarts batch ids at 0 under a fresh
    # checkpoint, so the replay guard is scoped by stream identity —
    # an unscoped guard would silently drop every batch here
    fresh = append_lsh_index(
        embeddings.limit(10), path, batch_id=0, stream_id=str(tmp_path / "ckpt2")
    )
    assert fresh["n_rows"] == geo["n_rows"] + 10
    assert spark.read.parquet(_ddir(spark, path)).count() == n_sig + 10 * geo["n_tables"]


def test_ingest_stream_rebase_guard(spark, embeddings, tmp_path):
    """VERDICT r10 #5: pointing a FRESH checkpoint at an index another
    stream already fed must refuse loudly (the new stream's batch ids
    restart at 0 and its batch 0 may replay already-folded source
    rows); ``allow_rebase=True`` declares a deliberate new source
    epoch and bumps ``ingest_epoch``; resuming the SAME checkpoint —
    the blessed path — is unchanged and needs no flag."""
    from hbacker_spark.operators.ann_index import (
        IndexContentionError,
        index_ingest_stream,
        read_geometry,
    )

    bucket = F.pmod(F.xxhash64("vec_id", F.lit(11)), F.lit(3))
    path = str(tmp_path / "lsh_rebase")
    src = str(tmp_path / "rebase_src")
    ckpt_a = str(tmp_path / "ckpt_a")
    build_lsh_index(embeddings.filter(bucket == 0), path, n_planes=4, n_shards=4)
    schema = embeddings.schema

    def drain(ckpt, **kw):
        stream = spark.readStream.schema(schema).parquet(src)
        q = index_ingest_stream(stream, path, ckpt, **kw)
        q.awaitTermination()

    embeddings.filter(bucket == 1).coalesce(1).write.mode("append").parquet(src)
    drain(ckpt_a)
    geo = read_geometry(spark, path)
    assert geo["last_stream_id"] == ckpt_a and geo["ingest_epoch"] == 0

    # blessed path: SAME checkpoint resumes with no flag
    embeddings.filter(bucket == 2).coalesce(1).write.mode("append").parquet(src)
    drain(ckpt_a)
    assert read_geometry(spark, path)["n_rows"] == embeddings.count()

    # fresh checkpoint + fed index → loud refusal, index untouched
    ckpt_b = str(tmp_path / "ckpt_b")
    with pytest.raises(IndexContentionError, match="allow_rebase"):
        drain(ckpt_b)
    assert read_geometry(spark, path)["last_stream_id"] == ckpt_a

    # declared rebase: new stream identity, epoch bumped, watermark
    # reset — batch 0 of the new stream folds (it re-reads the whole
    # source dir here, which is exactly the double-ingest the guard
    # makes the operator own)
    n_before = spark.read.parquet(_ddir(spark, path)).count()
    drain(ckpt_b, allow_rebase=True)
    geo = read_geometry(spark, path)
    assert geo["last_stream_id"] == ckpt_b and geo["ingest_epoch"] == 1
    assert spark.read.parquet(_ddir(spark, path)).count() > n_before


def test_compact_index_drops_replay_duplicates(spark, embeddings, tmp_path):
    """The residual streaming crash window double-appends a batch's
    rows; compaction drops the exact duplicates (index rows are
    deterministic per vector+geometry, so duplicates carry nothing)."""
    from hbacker_spark.operators.ann_index import append_lsh_index, compact_index

    half = embeddings.filter(F.col("vec_id") % 2 == 0)
    dup = embeddings.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 100))
    path = str(tmp_path / "lsh_dup")
    build_lsh_index(half, path, n_planes=DEFAULT_PLANES, n_shards=4)
    append_lsh_index(dup, path)  # committed append...
    append_lsh_index(dup, path)  # ...replayed without a batch_id guard

    sigs = spark.read.parquet(_ddir(spark, path))
    assert sigs.count() > sigs.dropDuplicates().count()
    compact_index(spark, path)
    sigs2 = spark.read.parquet(_ddir(spark, path))
    assert sigs2.count() == sigs2.dropDuplicates().count()
    # content equals the clean union
    clean = str(tmp_path / "lsh_clean")
    build_lsh_index(half.unionByName(dup), clean, n_planes=DEFAULT_PLANES, n_shards=4)
    assert sorted(map(tuple, sigs2.collect())) == sorted(
        map(tuple, spark.read.parquet(_ddir(spark, clean)).collect())
    )


def test_ivf_index_only_serving_with_stored_vectors(spark, embeddings, qvec, tmp_path):
    """store_vectors=True (the FAISS IndexIVFFlat shape): list rows
    carry their vectors, so topk(df=None) answers from the probed list
    directories alone — identical results to corpus-joined serving, and
    the plan provably never touches the corpus parquet. Appends keep
    the index vector-carrying; a vector-less index refuses index-only
    serving loudly."""
    from hbacker_spark.operators.ann_index import StoredIvfIndex, append_ivf_index

    half = embeddings.filter(F.col("vec_id") % 2 == 0)
    rest = embeddings.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_vecs")
    geo = build_ivf_index(
        half, path, dim=len(qvec), n_centroids=8, train_iters=2, store_vectors=True
    )
    assert geo["has_vectors"] is True
    append_ivf_index(rest, path)  # must stay vector-carrying

    idx = StoredIvfIndex(spark, path)
    index_only = idx.topk(None, qvec, k=10, nprobe=3)
    joined = idx.topk(embeddings, qvec, k=10, nprobe=3)
    assert _rows(index_only) == _rows(joined)

    # zero corpus access: every input file of the index-only plan lives
    # under the index; the corpus parquet appears nowhere
    files = index_only.inputFiles()
    assert files and all("/ivf_vecs/" in f for f in files), files
    assert not any("embeddings.parquet" in f for f in files), files

    plain = str(tmp_path / "ivf_novecs")
    build_ivf_index(half, plain, dim=len(qvec), n_centroids=8, train_iters=0)
    with pytest.raises(IndexGeometryError, match="store_vectors"):
        StoredIvfIndex(spark, plain).topk(None, qvec)


def test_scrub_index_forgets_ids_from_both_kinds(spark, embeddings, qvec, tmp_path):
    """Compliance deletion must reach the indexes, not just the corpus:
    after scrub_index the forgotten ids never appear as candidates (or
    as stored vectors in vector-carrying lists), layout and geometry
    survive, and n_rows decrements by the ids actually removed."""
    from hbacker_spark.operators.ann_index import read_geometry, scrub_index

    forget = embeddings.filter(F.col("vec_id") % 10 == 3).select("vec_id")
    n_forget = forget.count()

    lsh_path = str(tmp_path / "lsh_scrub")
    build_lsh_index(embeddings, lsh_path, n_planes=DEFAULT_PLANES, n_shards=4)
    stats = scrub_index(spark, lsh_path, forget)
    assert stats["ids_removed"] == n_forget
    sigs = spark.read.parquet(_ddir(spark, lsh_path))
    assert sigs.join(forget, "vec_id", "left_semi").count() == 0
    assert read_geometry(spark, lsh_path)["n_rows"] == embeddings.count() - n_forget
    # serving still works and can never return a scrubbed id
    got = {r["vec_id"] for r in
           ann_topk_stored(spark, embeddings, lsh_path, qvec, k=10, multiprobe=4).collect()}
    assert not {g for g in got if g % 10 == 3}

    ivf_path = str(tmp_path / "ivf_scrub")
    build_ivf_index(
        embeddings, ivf_path, dim=len(qvec), n_centroids=8, train_iters=0,
        store_vectors=True,
    )
    stats = scrub_index(spark, ivf_path, forget)
    assert stats["kind"] == "ivf" and stats["ids_removed"] == n_forget
    assigned = spark.read.parquet(_ddir(spark, ivf_path))
    assert assigned.join(forget, "vec_id", "left_semi").count() == 0
    # vector-carrying lists: the embedding itself is gone from storage
    assert "embedding" in assigned.columns


import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def spark_global(spark):
    # hypothesis needs the session as a plain value (same bridge as
    # test_merge_properties.py)
    return spark


@pytest.fixture(scope="module")
def small_embeddings(embeddings):
    return embeddings.limit(60).cache()


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 2), min_size=60, max_size=60))
def test_append_chain_equals_rebuild_property(spark_global, small_embeddings, assignment):
    """PROPERTY: for ANY ordered partition of the corpus into batches
    (build on the first, append the rest — empty appends included), the
    stored signature set equals a full rebuild's. The storage-layer
    analog of the state algebras' fold==recompute invariant, searched
    over random splits instead of the two fixed ones."""
    from hypothesis import assume

    from hbacker_spark.operators.ann_index import append_lsh_index

    spark = spark_global
    e = small_embeddings
    ids = [r["vec_id"] for r in e.select("vec_id").orderBy("vec_id").collect()]
    batches = {b: [i for i, a in zip(ids, assignment) if a == b] for b in (0, 1, 2)}
    assume(batches[0])  # an index cannot bootstrap from an empty build

    root = tempfile.mkdtemp(prefix="ann_prop_")
    inc = f"{root}/inc"
    build_lsh_index(
        e.filter(F.col("vec_id").isin(batches[0])), inc,
        n_planes=DEFAULT_PLANES, n_shards=4,
    )
    for b in (1, 2):
        append_lsh_index(e.filter(F.col("vec_id").isin(batches[b] or [-1])), inc)

    full = f"{root}/full"
    build_lsh_index(e, full, n_planes=DEFAULT_PLANES, n_shards=4)
    got = sorted(map(tuple, spark.read.parquet(_ddir(spark, inc)).collect()))
    want = sorted(map(tuple, spark.read.parquet(_ddir(spark, full)).collect()))
    assert got == want


def test_build_auto_geometry_defaults(spark, embeddings, tmp_path):
    """Production default: builders auto-size from the corpus (the same
    recommended_* rules the per-call forms apply), and the stored
    geometry records what the build actually used."""
    path = str(tmp_path / "lsh_auto")
    geo = build_lsh_index(embeddings, path)
    from hbacker_spark.operators.similarity import recommended_planes

    assert geo["n_planes"] == recommended_planes(embeddings.count())


# ---------------------------------------------------------------------------
# r10: rebuild lifecycle, mutation fence, stale-handle contract, URI schemes
# ---------------------------------------------------------------------------


def _replica(embeddings, k: int, stride: int = 500):
    """k disjoint-id copies of the embeddings table — the deterministic
    corpus-growth stand-in (same device as x100_receipt.py): geometry
    drift is a function of n_rows, which the sf0.01 table alone (500
    rows) can never push past the auto-sizing thresholds."""
    import functools

    dfs = [
        embeddings.select(
            (F.col("vec_id") + (i * stride)).alias("vec_id"), "embedding"
        )
        for i in range(k)
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), dfs)


def test_rebuild_lsh_after_drift(spark, embeddings, qvec, tmp_path):
    """VERDICT r9 #3 end-to-end: ingest past the drift threshold →
    health recommends rebuild → rebuild → geometry matches a fresh
    auto-sized build and serving answers are identical to that fresh
    build; the streaming replay watermark survives; the pre-rebuild
    handle fails LOUDLY, never silently."""
    from hbacker_spark.operators.ann_index import (
        StoredLshIndex,
        append_lsh_index,
        index_health,
        rebuild_index,
    )
    from hbacker_spark.operators.similarity import recommended_planes

    corpus = _replica(embeddings, 10)  # 5000 rows: auto planes 4 -> 5
    head = corpus.filter(F.col("vec_id") < 500)
    tail = corpus.filter(F.col("vec_id") >= 500)
    n_total = 5000
    path = str(tmp_path / "lsh_drift")
    geo = build_lsh_index(head, path, n_shards=4)  # auto-sized for 500 rows
    assert geo["n_planes"] == recommended_planes(500)

    append_lsh_index(tail, path, batch_id=7, stream_id="ckpt-A")
    health = index_health(spark, path)
    assert health["reindex_recommended"], "append chain should outgrow the geometry"
    assert recommended_planes(n_total) > geo["n_planes"]

    stale = StoredLshIndex(spark, path)
    assert stale.is_current()

    new_geo = rebuild_index(spark, path, corpus)
    assert new_geo["n_planes"] == recommended_planes(n_total)
    assert new_geo["version"] == geo.get("version", 0) + 1
    # replay watermark preserved: the ingest stream resumes without
    # re-folding batch 7
    assert new_geo["last_batch_id"] == 7 and new_geo["last_stream_id"] == "ckpt-A"
    assert not index_health(spark, path)["reindex_recommended"]

    # recall restored to the auto-geometry floor: identical answers to
    # a from-scratch auto build over the same corpus
    fresh_path = str(tmp_path / "lsh_fresh")
    build_lsh_index(corpus, fresh_path, n_shards=4)
    rebuilt = StoredLshIndex(spark, path)
    fresh = StoredLshIndex(spark, fresh_path)
    assert _rows(rebuilt.topk(corpus, qvec, k=10, multiprobe=2)) == _rows(
        fresh.topk(corpus, qvec, k=10, multiprobe=2)
    )

    # the pre-rebuild handle: probeably stale, but r11's versioned
    # layout keeps the previous data version as a grace copy for ONE
    # further swap — the handle still answers (its own snapshot,
    # never mixed versions) instead of FileNotFound-ing mid-read
    assert not stale.is_current()
    assert len(stale.topk(corpus, qvec, k=5).collect()) == 5
    # the NEXT mutation retires the grace copy: now loud, never wrong
    from hbacker_spark.operators.ann_index import compact_index

    compact_index(spark, path)
    with pytest.raises(Exception) as ei:
        stale.topk(corpus, qvec, k=5).collect()
    assert "FileNotFound" in str(ei.value) or "does not exist" in str(ei.value)


def test_rebuild_ivf_corpus_free_from_stored_vectors(spark, embeddings, qvec, tmp_path):
    """A store_vectors=True IVF index rebuilds from its OWN lists
    (df=None) — the corpus-free remediation path; a vector-less index
    refuses loudly; results match a fresh auto build."""
    from hbacker_spark.operators.ann_index import (
        StoredIvfIndex,
        append_ivf_index,
        index_health,
        rebuild_index,
    )
    from hbacker_spark.operators.similarity import recommended_centroids

    corpus = _replica(embeddings, 10)  # 5000 rows: sqrt(n)=70 > 2*16
    head = corpus.filter(F.col("vec_id") < 500)
    tail = corpus.filter(F.col("vec_id") >= 500)
    n_total = 5000
    path = str(tmp_path / "ivf_drift")
    geo = build_ivf_index(head, path, dim=len(qvec), n_centroids=16,
                          train_iters=1, store_vectors=True)
    append_ivf_index(tail, path)
    assert index_health(spark, path)["reindex_recommended"]  # sqrt(n) > 2*16

    new_geo = rebuild_index(spark, path)  # df=None: self-rebuild
    assert new_geo["n_centroids"] == recommended_centroids(n_total)
    assert new_geo["has_vectors"] is True
    assert new_geo["version"] == geo.get("version", 0) + 1

    fresh_path = str(tmp_path / "ivf_fresh")
    build_ivf_index(corpus, fresh_path, dim=len(qvec),
                    train_iters=1, store_vectors=True)
    got = StoredIvfIndex(spark, path).topk(None, qvec, k=10)
    want = StoredIvfIndex(spark, fresh_path).topk(None, qvec, k=10)
    assert _rows(got) == _rows(want)

    # vector-less LSH rebuild without a corpus refuses loudly
    lsh_path = str(tmp_path / "lsh_nocorpus")
    build_lsh_index(embeddings.limit(100), lsh_path, n_planes=4, n_shards=2)
    with pytest.raises(ValueError, match="corpus"):
        rebuild_index(spark, lsh_path)


def test_crashed_mutation_debris_never_eats_grace_copy(spark, embeddings, qvec, tmp_path):
    """r11 review regression: retirement must keep the data version the
    PRE-mutation geometry pointed at, not the newest-by-number dir — a
    crashed writer's unmarked debris dir outnumbers the live version,
    and keeping by number would preserve the debris while deleting the
    directory every in-flight reader and stale handle is actually on."""
    import os

    from hbacker_spark.operators import ann_index as AI
    from hbacker_spark.sources import storage

    path = str(tmp_path / "lsh_debris")
    build_lsh_index(embeddings.filter(F.col("vec_id") < 300), path,
                    n_planes=4, n_shards=2)              # data v0
    AI.compact_index(spark, path)                        # live v1, v0 grace
    handle = AI.StoredLshIndex(spark, path)              # serving v1
    before = _rows(handle.topk(embeddings, qvec, k=5))

    # a mutation "crashes" after writing data, before the geometry
    # commit: unmarked debris at the next version number
    storage.mkdirs(spark, storage.version_dir(f"{path}/signatures", 2))

    AI.compact_index(spark, path)                        # live becomes v3
    assert not handle.is_current()
    # grace contract intact: v1 (the handle's files) survived the swap
    assert _rows(handle.topk(embeddings, qvec, k=5)) == before
    names = set(os.listdir(f"{path}/signatures"))
    assert "v000002" not in names, "crashed-writer debris must be swept"
    assert "v000000" not in names, "expired grace copy must retire"
    assert {"v000001", "v000003"} <= names


def test_maintain_index_applies_health_policy(spark, embeddings, qvec, tmp_path):
    """VERDICT r10 #4: one maintain call applies index_health's own
    recommendations — an index grown past BOTH thresholds (geometry
    drift + append fragmentation) comes back clean from a single call
    (the rebuild path also defragments: one file per partition dir,
    so a prior compact pass would be a wasted full rewrite at scale);
    the streaming replay watermark survives; an immediate second call
    is a no-op, so a cron cadence needs no external state."""
    from hbacker_spark.operators.ann_index import (
        append_lsh_index,
        index_health,
        maintain_index,
    )

    corpus = _replica(embeddings, 10)  # 5000 rows: auto planes 4 -> 5
    head = corpus.filter(F.col("vec_id") < 500)
    path = str(tmp_path / "lsh_maintain")
    build_lsh_index(head, path, n_shards=4)
    # 6 small appends: past BOTH thresholds (plane drift + >4 files/dir)
    for i in range(6):
        lo, hi = 500 + i * 750, 500 + (i + 1) * 750
        append_lsh_index(
            corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path, batch_id=i, stream_id="ckpt-M",
        )
    health = index_health(spark, path)
    assert health["reindex_recommended"] and health["compact_recommended"]

    out = maintain_index(spark, path, corpus)
    assert out["actions"] == ["rebuild"]
    after = out["health_after"]
    assert not after["reindex_recommended"] and not after["compact_recommended"]
    geo = read_geometry(spark, path)
    assert geo["last_batch_id"] == 5 and geo["last_stream_id"] == "ckpt-M"

    again = maintain_index(spark, path, corpus)
    assert again["actions"] == []  # idempotent: clean index untouched
    assert read_geometry(spark, path)["version"] == geo["version"]

    # fragmentation-only drift → the cheaper compact path fires
    frag = str(tmp_path / "lsh_frag_only")
    build_lsh_index(corpus, frag, n_shards=4)
    for i in range(6):
        append_lsh_index(corpus.filter(F.col("vec_id") % 400 == i), frag)
    h = index_health(spark, frag)
    assert h["compact_recommended"] and not h["reindex_recommended"]
    out = maintain_index(spark, frag)
    assert out["actions"] == ["compact"]
    assert not out["health_after"]["compact_recommended"]


def test_index_mutation_fence_and_stale_handle(spark, embeddings, qvec, tmp_path, monkeypatch):
    """VERDICT r9 #6: (a) any mutator racing a held fence raises
    IndexContentionError after the bounded wait — an ingest append can
    never land rows under a concurrent maintenance swap and lose them;
    (b) an open handle across a compact keeps snapshot semantics: the
    swap deletes its cached files, so queries raise (no silent wrong
    rows) and is_current() flags the reopen."""
    from hbacker_spark.operators import ann_index as AI
    from hbacker_spark.sources import storage

    sub = embeddings.filter(F.col("vec_id") < 300)
    path = str(tmp_path / "fenced_idx")
    AI.build_lsh_index(sub, path, n_planes=4, n_shards=2)

    # (a) scrub-during-ingest contract: hold the fence (as a stalled
    # ingest append would) and assert maintenance + appends fail loudly
    monkeypatch.setattr(AI, "INDEX_FENCE_WAIT_S", 0.5)
    monkeypatch.setattr(AI, "INDEX_APPEND_WAIT_S", 0.5)
    assert storage.create_new_file(spark, f"{path}.lock")
    more = embeddings.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    with pytest.raises(AI.IndexContentionError, match="single-writer"):
        AI.append_lsh_index(more, path)
    with pytest.raises(AI.IndexContentionError):
        AI.compact_index(spark, path)
    with pytest.raises(AI.IndexContentionError):
        AI.scrub_index(spark, path, sub.select("vec_id").limit(5))
    storage.delete_path(spark, f"{path}.lock")
    AI.append_lsh_index(more, path)  # released → proceeds

    # (b) stale handle across compact: probeable immediately; r11 grace
    # keeps its files for ONE further swap (it still answers its own
    # snapshot), and the swap after that retires them — loud, never
    # silently wrong rows
    handle = AI.StoredLshIndex(spark, path)
    before = _rows(handle.topk(embeddings, qvec, k=5))
    assert handle.is_current()
    AI.compact_index(spark, path)
    assert not handle.is_current()
    assert _rows(handle.topk(embeddings, qvec, k=5)) == before  # grace copy
    AI.compact_index(spark, path)
    with pytest.raises(Exception) as ei:
        handle.topk(embeddings, qvec, k=5).collect()
    assert "FileNotFound" in str(ei.value) or "does not exist" in str(ei.value)
    reopened = AI.StoredLshIndex(spark, path)
    assert reopened.is_current()
    assert _rows(reopened.topk(embeddings, qvec, k=5)) == before


def test_index_ops_on_uri_scheme_path(spark, embeddings, qvec, tmp_path):
    """ADVICE r9 (medium): the full stored-index lifecycle — build,
    append, handle serving, compact, scrub, health, rebuild — on a
    scheme-qualified (file://) index path. Before the Hadoop-FS port
    every maintenance op died at its os.rename/os.walk on such a path,
    contradicting the module's any-scheme claim."""
    from hbacker_spark.operators.ann_index import (
        StoredLshIndex,
        append_lsh_index,
        compact_index,
        index_health,
        rebuild_index,
        scrub_index,
    )

    sub = embeddings.filter(F.col("vec_id") < 400)
    path = f"file://{tmp_path}/uri_idx"
    build_lsh_index(sub, path, n_planes=4, n_shards=2)
    append_lsh_index(embeddings.filter(F.col("vec_id") >= 400), path)
    assert read_geometry(spark, path)["n_rows"] == 500

    h = index_health(spark, path)
    assert h["partition_dirs"] > 0 and h["data_files"] > h["partition_dirs"]

    got = _rows(StoredLshIndex(spark, path).topk(embeddings, qvec, k=5))
    c = compact_index(spark, path)
    assert c["files_after"] < c["files_before"]
    assert _rows(StoredLshIndex(spark, path).topk(embeddings, qvec, k=5)) == got

    s = scrub_index(spark, path, embeddings.select("vec_id").filter(F.col("vec_id") < 10))
    assert s["ids_removed"] == 10

    r = rebuild_index(spark, path, embeddings)
    assert r["n_rows"] == 500 and r["version"] >= 3  # compact+scrub+rebuild bumps


def test_rebuild_mid_stream_preserves_watermark(spark, embeddings, qvec, tmp_path):
    """The production drift sequence end-to-end: bootstrap → streaming
    ingest → health-triggered rebuild BETWEEN drains → the SAME
    checkpointed stream resumes against the rebuilt geometry without
    re-folding its already-committed batches (the rebuild carries the
    replay watermark), and the final index equals a fresh build at the
    rebuilt geometry over every ingested row."""
    from hbacker_spark.operators.ann_index import (
        index_ingest_stream,
        read_geometry,
        rebuild_index,
    )

    bucket = F.pmod(F.xxhash64("vec_id", F.lit(7)), F.lit(3))
    boot = embeddings.filter(bucket == 0)
    path = str(tmp_path / "lsh_rbs")
    src = str(tmp_path / "rbs_src")
    ckpt = str(tmp_path / "rbs_ckpt")
    build_lsh_index(boot, path, n_planes=4, n_shards=8)
    schema = embeddings.schema

    def drain():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        index_ingest_stream(stream, path, ckpt).awaitTermination()

    embeddings.filter(bucket == 1).coalesce(1).write.mode("append").parquet(src)
    drain()
    geo_before = read_geometry(spark, path)
    wm = geo_before["last_batch_id"]
    assert wm is not None and geo_before["last_stream_id"] == ckpt

    # maintenance window: rebuild over everything ingested so far
    geo_rebuilt = rebuild_index(spark, path, embeddings.filter(bucket != 2))
    assert geo_rebuilt["last_batch_id"] == wm and geo_rebuilt["last_stream_id"] == ckpt

    # the SAME stream resumes: only the new file folds, under the
    # REBUILT geometry (read from the store, never from the caller)
    embeddings.filter(bucket == 2).coalesce(1).write.mode("append").parquet(src)
    drain()

    geo = read_geometry(spark, path)
    assert geo["n_rows"] == embeddings.count()
    full_path = str(tmp_path / "lsh_rbs_full")
    build_lsh_index(embeddings, full_path, n_planes=geo_rebuilt["n_planes"], n_shards=8)
    got = sorted(map(tuple, spark.read.parquet(_ddir(spark, path)).collect()))
    want = sorted(map(tuple, spark.read.parquet(_ddir(spark, full_path)).collect()))
    assert got == want


def test_versioned_index_lifecycle_on_viewfs(spark, embeddings, qvec, tmp_path):
    """r11 on the scheme class the versioned layout exists for: the
    full mutation lifecycle — build, append, maintain (compact),
    rebuild, scrub — against a viewfs:// mount, where os.* path
    assumptions and the old delete-then-rename swap semantics would
    both break. Pins that begin/commit/retire, the geometry pointer,
    and the grace copy all run through the Hadoop FileSystem API."""
    from hbacker_spark.operators import ann_index as AI

    backing = tmp_path / "vfs_idx"
    backing.mkdir()
    spark._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.annidx.link./root", f"file://{backing}"
    )
    path = "viewfs://annidx/root/lsh"
    sub = embeddings.filter(F.col("vec_id") < 300)
    build_lsh_index(sub, path, n_planes=4, n_shards=2)
    AI.append_lsh_index(embeddings.filter(F.col("vec_id") >= 300), path)
    assert read_geometry(spark, path)["n_rows"] == 500

    handle = AI.StoredLshIndex(spark, path)
    before = _rows(handle.topk(embeddings, qvec, k=5))

    out = AI.maintain_index(spark, path, embeddings)
    assert out["actions"] in ([], ["compact"], ["rebuild"])
    # grace copy serves the stale handle through one swap (if one ran)
    if out["actions"]:
        assert not handle.is_current()
        assert _rows(handle.topk(embeddings, qvec, k=5)) == before

    AI.rebuild_index(spark, path, embeddings)
    fresh = AI.StoredLshIndex(spark, path)
    assert _rows(fresh.topk(embeddings, qvec, k=5)) == before

    res = AI.scrub_index(spark, path, embeddings.select("vec_id").limit(7))
    assert res["ids_removed"] == 7
    assert read_geometry(spark, path)["n_rows"] == 493
    # nothing leaked onto a driver-local interpretation of the URI
    import os as _os

    assert not _os.path.exists("viewfs:")


def test_scrub_purge_removes_forgotten_bytes_immediately(spark, embeddings, tmp_path):
    """VERDICT r11 #5 / ADVICE r11: ``scrub_index(purge=True)`` must not
    leave the forgotten rows physically readable in the grace copy — a
    recursive read over EVERYTHING still on disk under the index root
    shows zero forgotten ids the moment the call returns, and exactly
    one data/geometry version remains (no grace copies)."""
    from hbacker_spark.operators.ann_index import scrub_index
    from hbacker_spark.sources import storage

    path = str(tmp_path / "lsh_purge")
    build_lsh_index(embeddings, path, n_planes=DEFAULT_PLANES, n_shards=4)
    # create a grace copy: compact publishes a new data version and keeps
    # the old one for in-flight readers — the copy a plain scrub leaves
    # the forgotten bytes in
    from hbacker_spark.operators.ann_index import compact_index

    compact_index(spark, path)
    sig_base = f"{path}/signatures"
    vdirs = [e["name"] for e in storage.list_path(spark, sig_base)
             if e["name"].startswith("v")]
    assert len(vdirs) == 2, "precondition: a grace data version exists"

    forget = embeddings.filter(F.col("vec_id") % 10 == 3).select("vec_id")
    stats = scrub_index(spark, path, forget, purge=True)
    assert stats["purged"] is True and stats["ids_removed"] == forget.count()

    # recursive listing: ONLY the fresh data version survives
    vdirs = [e["name"] for e in storage.list_path(spark, sig_base)
             if e["name"].startswith("v")]
    assert len(vdirs) == 1, vdirs
    geo_vs = storage.committed_versions(spark, f"{path}/geometry")
    assert len(geo_vs) == 1, geo_vs
    # and NOTHING readable anywhere under the index root still holds a
    # forgotten id — the compliance assertion itself
    everything = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(sig_base)
        .join(forget, "vec_id", "left_semi")
    )
    assert everything.count() == 0, "forgotten bytes survived the purge"


def test_index_health_surfaces_ingest_audit(spark, embeddings, tmp_path):
    """VERDICT r11 #7: index_health must report the streaming-ingest
    audit trail (feeding checkpoint, replay watermark, rebase epoch) —
    the operator-facing view of the rebase guard's state."""
    from hbacker_spark.operators.ann_index import append_lsh_index, index_health

    path = str(tmp_path / "lsh_audit")
    bucket = F.pmod(F.xxhash64("vec_id", F.lit(7)), F.lit(2))
    build_lsh_index(embeddings.filter(bucket == 0), path, n_planes=4, n_shards=4)
    h0 = index_health(spark, path)
    assert h0["ingest_epoch"] == 0 and h0["last_stream_id"] is None
    assert h0["last_batch_id"] is None

    append_lsh_index(
        embeddings.filter(bucket == 1), path, batch_id=4, stream_id="ckpt-A"
    )
    h1 = index_health(spark, path)
    assert h1["last_stream_id"] == "ckpt-A" and h1["last_batch_id"] == 4


def test_rebase_revalidates_stream_identity_under_fence(
    spark, embeddings, tmp_path, monkeypatch
):
    """ADVICE r11: the allow_rebase epoch bump re-reads geometry under
    the fence but used to trust the UNFENCED pre-check's last_stream_id
    — two new streams rebasing concurrently would both pass and the
    second silently overwrite the first's identity/watermark. Pin: a
    stream identity that CHANGED between the unfenced check and the
    fenced re-read raises IndexContentionError."""
    from hbacker_spark.operators import ann_index as AI

    path = str(tmp_path / "lsh_rebase_fence")
    build_lsh_index(embeddings, path, n_planes=4, n_shards=4)
    AI.append_lsh_index(embeddings.limit(1), path, batch_id=0, stream_id="ckpt-A")

    real = AI.read_geometry
    calls = {"n": 0}

    def raced(spark_, p):
        g = real(spark_, p)
        calls["n"] += 1
        if calls["n"] == 2:  # the fenced re-read: a concurrent rebase landed
            g["last_stream_id"] = "ckpt-OTHER"
        return g

    monkeypatch.setattr(AI, "read_geometry", raced)
    with pytest.raises(AI.IndexContentionError, match="rebased by a concurrent"):
        AI.index_ingest_stream(embeddings, path, str(tmp_path / "ckpt-B"),
                               allow_rebase=True)
    # the loser must not have touched the stored identity
    assert real(spark, path)["last_stream_id"] == "ckpt-A"
