"""Merge/SCD2 operators + property-based tests (hypothesis) for the core
pure semantics — the testing rigor SURVEY.md §5 notes the reference never
had. Spark-backed properties use small generated frames; pure-Python
properties run at full hypothesis default counts.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbacker_spark.functions.util import normalize_keys
from hbacker_spark.operators.merge import merge_delete, merge_upsert, scd2_apply

# ---- pure-function properties ------------------------------------------------

keys_st = st.dictionaries(
    st.text(min_size=1, max_size=12),
    st.one_of(st.integers(), st.text(max_size=5), st.booleans(), st.none()),
    max_size=6,
)


@given(keys_st)
def test_normalize_keys_idempotent(d):
    once = normalize_keys(d)
    assert normalize_keys(once) == once


@given(keys_st)
def test_normalize_keys_shape_preserved(d):
    out = normalize_keys(d)
    assert len(out) <= len(d)  # collisions may merge, never invent
    assert all(k == k.lower() for k in out)


# ---- Spark-backed properties (small bounded frames) --------------------------

rows_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 5), st.text(max_size=4)),
    min_size=0,
    max_size=25,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_st, rows_st)
def test_upsert_properties(spark_global, t_rows, s_rows):
    spark = spark_global
    schema = "k int, v int, payload string"
    target = spark.createDataFrame(t_rows, schema) if t_rows else spark.createDataFrame([], schema)
    source = spark.createDataFrame(s_rows, schema) if s_rows else spark.createDataFrame([], schema)
    merged = merge_upsert(target, source, ["k"]).collect()

    src_keys = {r[0] for r in s_rows}
    # every source row present verbatim
    assert sorted(t for t in map(tuple, merged) if t[0] in src_keys) == sorted(tuple(r) for r in s_rows)
    # target rows with non-colliding keys survive untouched
    surviving = sorted(tuple(r) for r in t_rows if r[0] not in src_keys)
    assert sorted(t for t in map(tuple, merged) if t[0] not in src_keys) == surviving


# conftest provides `spark` as a fixture; hypothesis needs it as a plain
# value — bridge via a module-level fixture wrapper.
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_merge_delete(spark):
    t = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    out = merge_delete(t, F.col("k") == 2)
    assert sorted(map(tuple, out.collect())) == [(1, "a"), (3, "c")]


def test_scd2_single_current_per_key(spark):
    hist = spark.createDataFrame(
        [(1, "v1", 100), (1, "v2", 200), (2, "x1", 150)],
        "k int, val string, valid_from long",
    )
    upd = spark.createDataFrame([(1, "v3", 300), (3, "new", 50)], "k int, val string, valid_from long")
    out = scd2_apply(hist, upd, ["k"], ts_col="valid_from")
    rows = {(r["k"], r["val"]): (r["valid_to"], r["is_current"]) for r in out.collect()}
    assert rows[(1, "v1")] == (200, False)
    assert rows[(1, "v2")] == (300, False)
    assert rows[(1, "v3")] == (None, True)
    assert rows[(2, "x1")] == (None, True)
    assert rows[(3, "new")] == (None, True)
    # exactly one current row per key
    cur = out.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_upsert_then_delete_roundtrip(spark):
    """Upserting rows then deleting them restores the original key set."""
    t = spark.createDataFrame([(i, i * 10) for i in range(5)], "k int, v int")
    s = spark.createDataFrame([(7, 70), (8, 80)], "k int, v int")
    merged = merge_upsert(t, s, ["k"])
    back = merge_delete(merged, F.col("k").isin(7, 8))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_incremental_dedup_state_split_invariant(spark, sf_dir):
    """state(A ∪ B ∪ C) == fold of per-batch states, in every fold
    order — the associativity/commutativity contract that makes
    incremental ingest exact."""
    from hbacker_spark.operators.incremental import dedup_state, merge_dedup_state
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(3))
    parts = [d.filter(bucket == i) for i in range(3)]
    full = sorted(map(tuple, dedup_state(d).collect()))

    s0, s1, s2 = (dedup_state(p) for p in parts)
    left_fold = sorted(map(tuple, merge_dedup_state(merge_dedup_state(s0, s1), s2).collect()))
    right_fold = sorted(map(tuple, merge_dedup_state(s0, merge_dedup_state(s1, s2)).collect()))
    swapped = sorted(map(tuple, merge_dedup_state(merge_dedup_state(s2, s0), s1).collect()))
    assert left_fold == full
    assert right_fold == full
    assert swapped == full
    # merging an EMPTY increment is the identity (idle ingest ticks)
    empty = dedup_state(d.filter(F.lit(False)))
    assert sorted(map(tuple, merge_dedup_state(s0, empty).collect())) == sorted(
        map(tuple, s0.collect())
    )


def test_incremental_chunk_dedup_state_split_invariant(spark, sf_dir):
    """The chunk-level first-occurrence state (incremental twin of the
    registered chunk_dedup_retention query) folds exactly: state over
    the full corpus == any fold order of per-batch states, empty
    increments are the identity, and the folded state reproduces the
    query's corpus-wide kept-chunk count (one row per distinct chunk,
    keeper = lexicographic-min (doc_id, chunk_idx))."""
    from hbacker_spark.operators.incremental import (
        chunk_dedup_state,
        merge_chunk_dedup_state,
    )
    from hbacker_spark.queries.llm_pipeline import chunk_dedup_retention
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(11)), F.lit(3))
    parts = [d.filter(bucket == i) for i in range(3)]
    full = sorted(map(tuple, chunk_dedup_state(d).collect()))

    s0, s1, s2 = (chunk_dedup_state(p) for p in parts)
    left = sorted(
        map(tuple, merge_chunk_dedup_state(merge_chunk_dedup_state(s0, s1), s2).collect())
    )
    swapped = sorted(
        map(tuple, merge_chunk_dedup_state(merge_chunk_dedup_state(s2, s0), s1).collect())
    )
    assert left == full
    assert swapped == full
    empty = chunk_dedup_state(d.filter(F.lit(False)))
    assert sorted(map(tuple, merge_chunk_dedup_state(s1, empty).collect())) == sorted(
        map(tuple, s1.collect())
    )
    # the state IS the retention ledger: total kept chunks in the
    # registered query == number of state rows (one keeper per chunk)
    kept_total = (
        chunk_dedup_retention(spark, sf_dir).agg(F.sum("kept_chunks")).first()[0]
    )
    assert kept_total == len(full)


def test_incremental_hll_state_fold_equals_full_build(spark, sf_dir):
    """Union of per-batch HLL sketches estimates EXACTLY like the
    sketch built over the full data — the register-maxima algebra that
    lets distinct-count state fold incrementally like the dedup state."""
    from pyspark.sql import functions as SF

    from hbacker_spark.operators.incremental import hll_state, merge_hll_state
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(2))
    s0 = hll_state(e.filter(bucket == 0), "event_type", "user_id")
    s1 = hll_state(e.filter(bucket == 1), "event_type", "user_id")
    folded = merge_hll_state(s0, s1, "event_type").select(
        "event_type", SF.hll_sketch_estimate("hll_sketch").alias("est")
    )
    full = hll_state(e, "event_type", "user_id").select(
        "event_type", SF.hll_sketch_estimate("hll_sketch").alias("est")
    )
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, full.collect()))


def test_incremental_cms_state_fold_equals_full_build(spark, sf_dir):
    """Counter-wise sum of per-batch count-min grids is bit-identical
    to the grid built over the full data — integer-sum algebra, no
    approximation in the MERGE itself."""
    from hbacker_spark.operators.incremental import cms_state, merge_cms_state
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("event_id", F.lit(5)), F.lit(3))
    s0, s1, s2 = (cms_state(e.filter(bucket == i), "user_id") for i in range(3))
    full = sorted(map(tuple, cms_state(e, "user_id").collect()))
    left = sorted(map(tuple, merge_cms_state(merge_cms_state(s0, s1), s2).collect()))
    right = sorted(map(tuple, merge_cms_state(s0, merge_cms_state(s1, s2)).collect()))
    assert left == full
    assert right == full


def test_incremental_bloom_state_fold_equals_full_and_idempotent(spark, sf_dir):
    """bit_or fold of per-batch Bloom bitsets equals the full-build
    bitset, and re-merging the same batch is a no-op (idempotence —
    safe replay of an ingest shard)."""
    from hbacker_spark.operators.incremental import bloom_state, merge_bloom_state
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(11)), F.lit(2))
    s0 = bloom_state(d.filter(bucket == 0), "text")
    s1 = bloom_state(d.filter(bucket == 1), "text")
    full = sorted(map(tuple, bloom_state(d, "text").collect()))
    folded = sorted(map(tuple, merge_bloom_state(s0, s1).collect()))
    assert folded == full
    replay = sorted(map(tuple, merge_bloom_state(merge_bloom_state(s0, s1), s1).collect()))
    assert replay == full


def test_incremental_ann_index_fold_equals_full_build(spark, sf_dir):
    """ANN index ingest algebra (VERDICT r4 #5): folding batches into
    the (postings, pairs) state — in any 3-way split and order — equals
    the full uncapped build, bit-for-bit, for BOTH state relations; and
    the pairs state equals ann_candidate_pairs over the full corpus
    (no bucket is capped at this scale, asserted, so the comparison is
    exact rather than vacuous)."""
    from hbacker_spark.operators.incremental import (
        ann_ingest_batch,
        ann_pairs_state,
        lsh_postings_state,
    )
    from hbacker_spark.operators.similarity import ann_bucket_stats, ann_candidate_pairs
    from hbacker_spark.sources.tables import load_table

    from hbacker_spark.operators.similarity import DEFAULT_PLANES

    e = load_table(spark, sf_dir, "embeddings")
    # no hot-bucket cap bites at test scale -> batch path is exact.
    # Geometry pinned to the incremental state's (lsh_postings_state
    # uses DEFAULT_PLANES): the r9 auto default would size to the
    # corpus, which is exactly what a persistent index must NOT do
    # between ingest batches.
    assert (
        ann_bucket_stats(e, n_planes=DEFAULT_PLANES).agg(F.sum("n_capped_buckets")).collect()[0][0] == 0
    )
    full_pairs = sorted(map(tuple, ann_pairs_state(e).collect()))
    assert full_pairs == sorted(
        map(tuple, ann_candidate_pairs(e, n_planes=DEFAULT_PLANES).collect())
    )

    bucket = F.pmod(F.xxhash64("vec_id", F.lit(11)), F.lit(3))
    parts = [e.filter(bucket == i) for i in range(3)]

    def fold(order):
        posts = lsh_postings_state(parts[order[0]])
        pairs = ann_pairs_state(parts[order[0]])
        for i in order[1:]:
            posts, pairs = ann_ingest_batch(posts, pairs, parts[i])
        return posts, pairs

    full_posts = sorted((r["table_idx"], r["bucket"], tuple(r["ds"]))
                        for r in lsh_postings_state(e).collect())
    for order in ([0, 1, 2], [2, 0, 1]):
        posts, pairs = fold(order)
        assert sorted(
            (r["table_idx"], r["bucket"], tuple(r["ds"])) for r in posts.collect()
        ) == full_posts, order
        assert sorted(map(tuple, pairs.collect())) == full_pairs, order

    # empty-batch ingest is the identity (idle ticks)
    p0, q0 = lsh_postings_state(parts[0]), ann_pairs_state(parts[0])
    pe, qe = ann_ingest_batch(p0, q0, e.filter(F.lit(False)))
    assert sorted(map(tuple, qe.collect())) == sorted(map(tuple, q0.collect()))
    assert pe.count() == p0.count()


def test_ann_ingest_stream_equals_full_build(spark, sf_dir, tmp_path):
    """The streaming driver (foreachBatch fold with parquet-persisted
    state, incl. a restart between drains) maintains the SAME index the
    full uncapped batch build produces — the operational stream==batch
    contract for incremental embedding ingest."""
    import os

    from hbacker_spark.operators.incremental import (
        ann_ingest_stream,
        ann_pairs_state,
        lsh_postings_state,
    )
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    bucket = F.pmod(F.xxhash64("vec_id", F.lit(5)), F.lit(2))
    src = str(tmp_path / "stream_src")
    state = str(tmp_path / "ann_state")
    ckpt = str(tmp_path / "ckpt")
    schema = e.schema

    def drain():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        q = ann_ingest_stream(stream, state, ckpt)
        q.awaitTermination()

    # batch 0 lands, first drain builds the state
    e.filter(bucket == 0).coalesce(1).write.mode("append").parquet(src)
    drain()
    # batch 1 lands later; a RESTARTED query folds only the delta
    e.filter(bucket == 1).coalesce(1).write.mode("append").parquet(src)
    drain()

    from hbacker_spark.operators.incremental import read_ann_state

    posts_df, pairs_df = read_ann_state(spark, state)
    got_pairs = sorted(map(tuple, pairs_df.collect()))
    assert got_pairs == sorted(map(tuple, ann_pairs_state(e).collect()))
    got_posts = sorted(
        (r["table_idx"], r["bucket"], tuple(r["ds"]))
        for r in posts_df.collect()
    )
    assert got_posts == sorted(
        (r["table_idx"], r["bucket"], tuple(r["ds"]))
        for r in lsh_postings_state(e).collect()
    )

    # at-least-once replay idempotency (ADVICE r5): simulate a crash
    # between the batch-keyed writes and the stream-checkpoint commit
    # by re-running the LAST fold with the same batch_id against the
    # surviving on-disk state — output must be byte-identical, not
    # doubled (no duplicate pair deltas, no re-merged postings).
    import glob

    ids = sorted(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(os.path.join(state, "postings", "batch_id=*"))
    )
    last = ids[-1]
    from hbacker_spark.operators.incremental import ann_ingest_batch

    prior_posts = spark.read.parquet(
        os.path.join(state, "postings", f"batch_id={ids[-2]}")
    )
    replay_posts, replay_delta = ann_ingest_batch(
        prior_posts, None, e.filter(bucket == 1), merge_pairs=False
    )
    replay_delta.write.mode("overwrite").parquet(
        os.path.join(state, "pairs", f"batch_id={last}")
    )
    replay_posts.write.mode("overwrite").parquet(
        os.path.join(state, "postings", f"batch_id={last}")
    )
    posts_df2, pairs_df2 = read_ann_state(spark, state)
    assert sorted(map(tuple, pairs_df2.collect())) == got_pairs
    assert sorted(
        (r["table_idx"], r["bucket"], tuple(r["ds"])) for r in posts_df2.collect()
    ) == got_posts


def test_ann_ingest_delta_mode_unions_to_full(spark, sf_dir):
    """Production mode (merge_pairs=False): postings are the only
    mutable state; each batch emits only its NEW pairs. The union of
    all deltas equals the full uncapped build — per-batch cost then
    tracks the batch's expansion, not |accumulated pairs|."""
    from hbacker_spark.operators.incremental import (
        ann_ingest_batch,
        ann_pairs_state,
        lsh_postings_state,
    )
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    bucket = F.pmod(F.xxhash64("vec_id", F.lit(13)), F.lit(3))
    parts = [e.filter(bucket == i) for i in range(3)]
    posts = lsh_postings_state(parts[0])
    deltas = [ann_pairs_state(parts[0])]
    for i in (1, 2):
        posts, d = ann_ingest_batch(posts, None, parts[i], merge_pairs=False)
        deltas.append(d)
    unioned = deltas[0]
    for d in deltas[1:]:
        unioned = unioned.unionByName(d)
    assert sorted(map(tuple, unioned.collect())) == sorted(
        map(tuple, ann_pairs_state(e).collect())
    )


def test_ann_ingest_per_batch_cap_is_sound(spark, sf_dir):
    """Capped ingest (max_bucket) is approximate by design — but must
    be SOUND: every capped pair is an uncapped pair, shared-bucket
    counts never exceed the exact ones, and the cap actually bites at
    this corpus density (non-vacuous)."""
    from hbacker_spark.operators.incremental import (
        ann_ingest_batch,
        ann_pairs_state,
        lsh_postings_state,
    )
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    bucket = F.pmod(F.xxhash64("vec_id", F.lit(17)), F.lit(2))
    b0, b1 = (e.filter(bucket == i) for i in range(2))
    posts = lsh_postings_state(b0)
    exact = {
        (r["vec_a"], r["vec_b"]): r["n_shared_buckets"]
        for r in ann_ingest_batch(posts, None, b1, merge_pairs=False)[1].collect()
    }
    capped = {
        (r["vec_a"], r["vec_b"]): r["n_shared_buckets"]
        for r in ann_ingest_batch(
            posts, None, b1, merge_pairs=False, max_bucket=8
        )[1].collect()
    }
    assert 0 < len(capped) < len(exact)  # bites, but not to zero
    for k, v in capped.items():
        assert k in exact and v <= exact[k], k


def test_state_fold_stream_dedup_equals_full(spark, sf_dir, tmp_path):
    """The generic mergeable-state streaming driver, instantiated for
    exact dedup: two drains with a restart between them fold to state
    identical to the full-corpus build. One driver shape covers the
    whole state-algebra family (dedup/Bloom/CMS/HLL)."""
    from hbacker_spark.operators.incremental import (
        dedup_state,
        merge_dedup_state,
        state_fold_stream,
    )
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(19)), F.lit(2))
    src = str(tmp_path / "src")
    state = str(tmp_path / "dedup_state")
    ckpt = str(tmp_path / "ckpt")
    cols = d.select("doc_id", "text")
    schema = cols.schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = state_fold_stream(stream, state, ckpt, dedup_state, merge_dedup_state)
        q.awaitTermination()

    cols.filter(bucket == 0).coalesce(1).write.mode("append").parquet(src)
    drain()
    cols.filter(bucket == 1).coalesce(1).write.mode("append").parquet(src)
    drain()

    from hbacker_spark.operators.incremental import read_folded_state

    got = sorted(map(tuple, read_folded_state(spark, state).collect()))
    assert got == sorted(map(tuple, dedup_state(d).collect()))


def test_state_fold_stream_with_uri_state_dir(spark, sf_dir, tmp_path):
    """The r6 durability fix routes state-dir probing through the
    Hadoop FileSystem API; a scheme-qualified URI (file://...) stands
    in for hdfs://s3a:// here — under the old os.path.exists probing
    a URI state dir made every batch think it was the first one
    (silently wrong state); now it folds correctly."""
    from hbacker_spark.operators.incremental import (
        dedup_state,
        merge_dedup_state,
        read_folded_state,
        state_fold_stream,
    )
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(23)), F.lit(2))
    src = str(tmp_path / "src")
    state = f"file://{tmp_path}/uri_state"
    ckpt = str(tmp_path / "ckpt")
    cols = d.select("doc_id", "text")
    schema = cols.schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = state_fold_stream(stream, state, ckpt, dedup_state, merge_dedup_state)
        q.awaitTermination()

    cols.filter(bucket == 0).coalesce(1).write.mode("append").parquet(src)
    drain()
    cols.filter(bucket == 1).coalesce(1).write.mode("append").parquet(src)
    drain()

    got = sorted(map(tuple, read_folded_state(spark, state).collect()))
    assert got == sorted(map(tuple, dedup_state(d).collect()))


def test_incremental_span_dedup_state_split_invariant(spark, sf_dir):
    """The overlapping-gram ownership state (incremental twin of the
    registered span_removal_filter query) folds exactly: full-corpus
    state == any fold order of per-batch states, empty increments are
    the identity, and the state agrees with the filter — a gram whose
    owner is unique (n_occurrences == 1) never causes removal, so total
    removed words is bounded by SPAN_W x duplicate gram occurrences."""
    from hbacker_spark.operators.incremental import (
        merge_span_dedup_state,
        span_dedup_state,
    )
    from hbacker_spark.queries.llm_pipeline import SPAN_W, span_removal_filter
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(3))
    parts = [d.filter(bucket == i) for i in range(3)]
    full = sorted(map(tuple, span_dedup_state(d).collect()))

    s0, s1, s2 = (span_dedup_state(p) for p in parts)
    left = sorted(
        map(tuple, merge_span_dedup_state(merge_span_dedup_state(s0, s1), s2).collect())
    )
    swapped = sorted(
        map(tuple, merge_span_dedup_state(merge_span_dedup_state(s2, s0), s1).collect())
    )
    assert left == full
    assert swapped == full
    empty = span_dedup_state(d.filter(F.lit(False)))
    assert sorted(map(tuple, merge_span_dedup_state(s1, empty).collect())) == sorted(
        map(tuple, s1.collect())
    )
    # cross-check against the filter: duplicate gram occurrences =
    # sum(n_occurrences - 1); each covers at most SPAN_W words
    dup_occ = sum(r[3] - 1 for r in full)
    removed = span_removal_filter(spark, sf_dir).agg(F.sum("removed_words")).first()[0]
    assert 0 < removed <= SPAN_W * dup_occ
