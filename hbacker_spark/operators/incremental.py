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
