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


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) rows — the codegen-friendly shape: downstream hash +
    aggregate expressions stay inside whole-stage codegen instead of
    interpreted higher-order-function lambdas (~100x faster per element)."""
    return docs.select(F.col(id_col), F.explode(word_shingles(text_col)).alias("shingle"))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_hashes: int = NUM_HASHES) -> DataFrame:
    """Per-doc MinHash signature columns mh_0..mh_{n-1}.

    One shuffle on id; hash(shingle, seed) and min() are codegen'd
    expressions evaluated per exploded row.
    """
    sh = exploded_shingles(docs, id_col, text_col)
    aggs = [F.min(F.hash("shingle", F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (sign-sum of shingle-hash bits).

    Shape: explode shingles → xxhash64 once per shingle (codegen) →
    64 conditional-SUM aggregates per doc (codegen, partial map-side) →
    one projection recombining the bit votes into a BIGINT. Linear in
    corpus size with a single shuffle on doc id.
    """
    sh = exploded_shingles(docs, id_col, text_col).withColumn("h", F.xxhash64("shingle"))
    vote = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1 = 1"), 1).otherwise(-1)
        ).alias(f"bit_{b}")
        for b in range(64)
    ]
    per_doc = sh.groupBy(id_col).agg(*vote)
    acc = F.lit(0).cast("bigint")
    for b in range(64):
        bit_value = 2**b if b < 63 else -(2**63)  # bit 63 is the int64 sign bit
        acc = acc + F.when(F.col(f"bit_{b}") > 0, F.lit(bit_value).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return per_doc.select(F.col(id_col), acc.alias("simhash"))


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """End-to-end MinHash-LSH candidate pair generation.

    signatures (linear, codegen) → band hashes (xxhash64 over each band's
    signature slice) → equi-join on (band_idx, band_hash) so candidate
    generation stays sub-quadratic. Returns (doc_a, doc_b,
    n_shared_bands) with doc_a < doc_b.
    """
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes)
    n_bands = num_hashes // band_size
    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(*[F.col(f"mh_{b * band_size + j}") for j in range(band_size)]).alias(
                            "band_hash"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), F.col("band.band_idx"), F.col("band.band_hash"))
    a = band_rows.alias("a")
    b = band_rows.alias("b")
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
