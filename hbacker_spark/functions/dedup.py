"""Dedup primitives: shingling, MinHash signatures, LSH banding, SimHash.

All engine-side (split/transform/hash/xxhash64 are Catalyst expressions).
The LSH pipeline is the 100 TB-scale shape: per-doc signature (linear
scan) → explode bands (constant fan-out) → bucket-join on (band, hash)
so candidate generation never goes quadratic; only in-bucket pairs are
scored exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 3
NUM_HASHES = 16
BAND_SIZE = 4  # → 4 bands of 4 hashes


def word_shingles(col: str = "text", k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles. Guarded: docs with < k words → empty
    (Spark's sequence(1,0) would count *down*, unlike DuckDB's)."""
    ws = f"split({col}, ' ')"
    return F.expr(
        f"CASE WHEN size({ws}) >= {k} THEN "
        f"array_distinct(transform(sequence(1, size({ws}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({ws}, i, {k})))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def sql_word_shingles(col: str = "text", k: int = SHINGLE_K) -> str:
    """DuckDB mirror of :func:`word_shingles` (generate_series(1,0) is
    already empty there, no guard needed)."""
    ws = f"string_split({col}, ' ')"
    return (
        f"list_distinct(list_transform(generate_series(1, CAST(len({ws}) - {k - 1} AS INT)), "
        f"i -> array_to_string({ws}[i:i+{k - 1}], ' ')))"
    )


def minhash_signature(shingles_col: str = "shingles", num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature: per seed i, min over shingles of murmur3(s, i).

    Empty shingle sets get NULL mins — callers should filter those out
    before banding.
    """
    mins = [F.expr(f"array_min(transform({shingles_col}, s -> hash(s, {i})))") for i in range(num_hashes)]
    return F.array(*mins)


def lsh_bands(sig_col: str = "minhash", num_hashes: int = NUM_HASHES, band_size: int = BAND_SIZE) -> Column:
    """Array of (band_idx, band_hash) structs: hash of each signature band."""
    n_bands = num_hashes // band_size
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.xxhash64(F.expr(f"slice({sig_col}, {b * band_size + 1}, {band_size})")).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    return F.array(*bands)


def simhash64(shingles_col: str = "shingles") -> Column:
    """64-bit SimHash over shingle xxhash64 bits (sign-sum per bit).

    Expressed as a fold over the shingle array accumulating 64 bit-counts,
    then re-thresholded — all in one Catalyst expression.
    """
    return F.expr(
        f"aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, bit) -> "
        f"acc + CASE WHEN aggregate({shingles_col}, CAST(0 AS BIGINT), "
        f"(c, s) -> c + CASE WHEN (xxhash64(s) >> bit) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END)"
    )


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """End-to-end MinHash-LSH candidate pair generation.

    Returns distinct (doc_a, doc_b, n_shared_bands) with doc_a < doc_b.
    """
    sigs = (
        docs.select(F.col(id_col), word_shingles(text_col).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .select(F.col(id_col), minhash_signature().alias("minhash"))
        .select(F.col(id_col), F.explode(lsh_bands()).alias("band"))
        .select(F.col(id_col), F.col("band.band_idx"), F.col("band.band_hash"))
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
