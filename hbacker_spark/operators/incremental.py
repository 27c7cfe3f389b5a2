"""Incremental dedup-state maintenance (the 100 TB ingest story).

Recomputing exact dedup over the whole corpus for every new snapshot
session is the one cost the snapshot layer's incremental chain
(operators/snapshots.py) is designed to avoid for raw data — this
module avoids it for the DERIVED dedup state too. The state is the
(text_hash, keeper_id, n_copies) relation of ``dedup_exact_groups``;
because min() and sum() are associative and commutative, the state of
a union of batches is the fold of per-batch states:

    state(A ∪ B) == merge(state(A), state(B))   (any order, any split)

so ingesting a new 1 TB batch into a 100 TB corpus costs one state
build over the BATCH plus one merge shuffle over (stored state ∪ batch
state) — the raw history is never rescanned. Store the state table
bucketed by text_hash and the merge co-locates without a shuffle of
the stored side. The same algebra extends to any decomposable
aggregate state (counts, sums, min/max keepers, HLL sketches); a
non-decomposable keeper rule (e.g. "keep highest quality score" is
fine via max_by, but "keep the median" is not) would force the full
recompute this module exists to avoid.

Proof obligations: the registered query ``dedup_groups_incremental``
builds the state as a two-batch fold and is oracle-checked against the
full-corpus SQL (driver gate); the associativity/split-invariance
property is pinned over random 3-way splits in
tests/test_merge_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_state(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_hash, keeper_id, n_copies) dedup state of one batch.

    One hash-shuffle on the content hash with map-side partial
    aggregation; keeper = min id (deterministic, merge-stable).
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def merge_dedup_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Associative + commutative merge of two dedup states.

    min-of-min and sum-of-count are exact regardless of merge order or
    partitioning, so folds of any batch split agree bit-for-bit with
    the full recompute. One shuffle over the two states' union — never
    over raw documents.
    """
    return (
        a.unionByName(b)
        .groupBy("text_hash")
        .agg(
            F.min("keeper_id").alias("keeper_id"),
            F.sum("n_copies").cast("bigint").alias("n_copies"),
        )
    )


def hll_state(df: DataFrame, group_col: str, distinct_col: str) -> DataFrame:
    """Per-group HLL sketch state — the decomposable form of grouped
    count-distinct. Same incremental algebra as the dedup state: the
    sketch's registers are element-wise maxima, so union-of-batch-
    sketches equals the sketch of the union (insertion order and batch
    split are irrelevant). State rows are (group, ~KB binary)."""
    return df.groupBy(group_col).agg(F.hll_sketch_agg(distinct_col).alias("hll_sketch"))


def merge_hll_state(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Merge two per-group HLL states (register-maxima union)."""
    return (
        a.unionByName(b)
        .groupBy(group_col)
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
    )


def _md5_mod(prefix_col, key_col, mod: int):
    """Portable row hash: first 8 md5 hex chars of "seed:key" as a
    positive long, mod ``mod`` — the same construction the oracled
    cms_heavy_hitters / bloom_decontamination_probe queries use, so
    incremental states fold bit-identically with their full builds."""
    h = F.md5(F.concat(prefix_col.cast("string"), F.lit(":"), key_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def cms_state(df: DataFrame, key_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """(seed, bucket, cnt) count-min grid of one batch — depth*width
    counters total, one map-side-combining shuffle of depth*n rows."""
    seeds = F.explode(F.array([F.lit(i) for i in range(depth)])).alias("seed")
    return (
        df.select(F.col(key_col).alias("_k"), seeds)
        .select("seed", _md5_mod(F.col("seed"), F.col("_k"), width).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum: grid(A ∪ B) == merge(grid(A), grid(B)) exactly
    (integer sums are associative/commutative), so per-day or per-batch
    grids roll up without rescanning events. The merge shuffles at most
    2*depth*width counter rows — constant, independent of data volume."""
    return (
        a.unionByName(b)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def bloom_state(df: DataFrame, item_col: str, words: int = 8192, k: int = 3) -> DataFrame:
    """(word, bits) Bloom bitset of one batch's item set (32 bits per
    BIGINT word — the engine-portable packing of the oracled probe)."""
    m = words * 32
    seeds = F.explode(F.array([F.lit(j) for j in range(k)])).alias("seed")
    return (
        df.select(F.col(item_col).alias("_it"), seeds)
        .select(_md5_mod(F.col("seed"), F.col("_it"), m).alias("idx"))
        .select(
            F.expr("idx div 32").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))").alias("_b"),
        )
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
    )


def merge_bloom_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """bit_or of bitsets == bitset of the set union (idempotent as well
    as associative/commutative — re-ingesting the same eval shard is a
    no-op). State stays <= ``words`` rows forever; a growing eval set
    only flips more bits."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
