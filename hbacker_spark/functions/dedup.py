"""Dedup primitives: shingling, MinHash signatures, LSH banding, SimHash.

All engine-side (split/transform/md5/conv are Catalyst expressions).
The LSH pipeline is the 100 TB-scale shape: per-doc signature (linear
scan) → explode bands (constant fan-out) → bucket-join on (band, hash)
so candidate generation never goes quadratic; only in-bucket pairs are
scored exactly.

Hash portability (VERDICT r5 #1): the sketch hashes are md5-derived —
``conv(substr(md5(seed:shingle), 1, 8), 16, 10)`` for MinHash values
and per-nibble bit votes of ``md5(shingle)`` for SimHash — instead of
the engine-internal murmur3/xxhash64. md5 is bit-identical across
engines (RFC 1321), so every sketch in this module is now rebuildable
by DuckDB and the minhash/simhash/LSH queries are FULLY oracled, not
rows-only. Cost: ~2× per exploded shingle row vs xxhash64 (md5 is 64
rounds vs 2 multiplies), still whole-stage codegen, still one linear
scan — at 100 TB the shuffle (on doc id / band hash) dominates either
way, so portability is bought at noise-level cost.
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


def minhash_value(shingle_col: str, seed: int) -> Column:
    """Portable 32-bit MinHash value: first 8 md5 hex chars of
    "seed:shingle" as a non-negative BIGINT — the same construction the
    oracled cms/bloom/sample queries use, so DuckDB rebuilds identical
    signatures via ``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT)``."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(shingle_col)).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature columns mh_0..mh_{n-1}.

    One shuffle on id; md5-derived hash values and min() are codegen'd
    expressions evaluated per exploded row (portable: DuckDB rebuilds
    the identical signature matrix — see module doc). ``sh`` (r14,
    guide §2.4) lets a caller that ALSO consumes the exploded shingle
    relation pass its (typically checkpointed) copy so the split +
    shingle explode — the most expensive per-byte pass in the pipeline —
    runs once instead of once per consumer; it must be exactly
    :func:`exploded_shingles` over the same docs.
    """
    if sh is None:
        sh = exploded_shingles(docs, id_col, text_col)
    aggs = [F.min(minhash_value("shingle", i)).alias(f"mh_{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


_HEXC = "0123456789abcdef"


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (sign-sum of shingle-hash bits) as a
    16-nibble hex STRING.

    Shape: explode shingles → md5 once per shingle (codegen) → the 16
    hex nibbles each carry 4 hash bits → 64 conditional-SUM aggregates
    per doc (codegen, partial map-side) → one projection recombining
    the majority votes into the output hex digest. Linear in corpus
    size with a single shuffle on doc id. Hex-string output (rather
    than a BIGINT with a sign-bit hack) keeps the fingerprint
    engine-portable AND avoids int64 sign issues; Hamming distance is
    still cheap: compare per-nibble via bit_count(xor) after a conv, or
    band the 16 chars directly for LSH-style blocking."""
    sh = exploded_shingles(docs, id_col, text_col).withColumn(
        "h", F.md5(F.col("shingle").cast("binary"))
    )
    for i in range(16):
        sh = sh.withColumn(f"nib_{i}", F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int"))
    vote = [
        F.sum(
            F.when(F.expr(f"(nib_{b // 4} >> {b % 4}) & 1 = 1"), 1).otherwise(-1)
        ).alias(f"bit_{b}")
        for b in range(64)
    ]
    per_doc = sh.groupBy(id_col).agg(*vote)
    chars = [
        F.expr(
            "substring('" + _HEXC + "', CAST("
            + " + ".join(
                f"(CASE WHEN bit_{i * 4 + j} > 0 THEN {2**j} ELSE 0 END)" for j in range(4)
            )
            + " + 1 AS INT), 1)"
        )
        for i in range(16)
    ]
    return per_doc.select(F.col(id_col), F.concat(*chars).alias("simhash"))


def sql_simhash_table(doc_rel: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of :func:`simhash_table`: identical md5-nibble bit
    votes, reassembled with a positionally-ordered string_agg. The
    64-row bit fan-out per shingle is oracle-side only — the engine
    keeps the vote matrix as 64 aggregate columns with no row blowup."""
    return f"""
    WITH sh AS (
      SELECT {id_col}, unnest({sql_word_shingles(text_col)}) AS shingle
      FROM {doc_rel}
    ),
    nib AS (
      SELECT {id_col}, g.i AS pos,
             CAST(('0x' || substr(md5(shingle), g.i, 1)) AS BIGINT) AS v
      FROM sh CROSS JOIN generate_series(1, 16) AS g(i)
    ),
    votes AS (
      SELECT {id_col}, pos,
             SUM(CASE WHEN (v & 1) = 1 THEN 1 ELSE -1 END)  AS s0,
             SUM(CASE WHEN ((v >> 1) & 1) = 1 THEN 1 ELSE -1 END) AS s1,
             SUM(CASE WHEN ((v >> 2) & 1) = 1 THEN 1 ELSE -1 END) AS s2,
             SUM(CASE WHEN ((v >> 3) & 1) = 1 THEN 1 ELSE -1 END) AS s3
      FROM nib GROUP BY {id_col}, pos
    )
    SELECT {id_col},
           string_agg(substr('{_HEXC}',
             CAST(CASE WHEN s0 > 0 THEN 1 ELSE 0 END
                + CASE WHEN s1 > 0 THEN 2 ELSE 0 END
                + CASE WHEN s2 > 0 THEN 4 ELSE 0 END
                + CASE WHEN s3 > 0 THEN 8 ELSE 0 END + 1 AS INT), 1),
             '' ORDER BY pos) AS simhash
    FROM votes GROUP BY {id_col}
    """


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH candidate pair generation.

    signatures (linear, codegen) → band hashes (md5 over each band's
    comma-joined signature slice — portable, see module doc) →
    equi-join on (band_idx, band_hash) so candidate generation stays
    sub-quadratic. Returns (doc_a, doc_b, n_shared_bands) with
    doc_a < doc_b. ``sigs`` (r13) lets a caller that ALSO consumes the
    signature matrix pass a materialized copy so the md5-heavy
    signature pass runs once instead of per consumer — it must be
    exactly :func:`minhash_signatures` over the same docs.
    """
    if sigs is None:
        sigs = minhash_signatures(docs, id_col, text_col, num_hashes)
    n_bands = num_hashes // band_size
    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh_{b * band_size + j}").cast("string")
                                    for j in range(band_size)
                                ],
                            ).cast("binary")
                        ).alias("band_hash"),
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


def sql_lsh_candidate_pairs(
    doc_rel: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> str:
    """DuckDB mirror of :func:`lsh_candidate_pairs`: the identical
    md5-derived signature matrix (min over shingles per seed), band
    digests from the comma-joined signature slice, and the same
    (band_idx, band_hash) self-join — so the candidate PAIR SET, not
    just its size, is hash-checked cross-engine."""
    return f"""
    WITH sh AS (
      SELECT {id_col}, unnest({sql_word_shingles(text_col)}) AS shingle
      FROM {doc_rel}
    ),
    mh AS (
      SELECT {id_col}, g.i AS seed,
             MIN(CAST(('0x' || substr(md5(g.i || ':' || shingle), 1, 8)) AS BIGINT)) AS mh
      FROM sh CROSS JOIN generate_series(0, {num_hashes - 1}) AS g(i)
      GROUP BY {id_col}, g.i
    ),
    bands AS (
      SELECT {id_col}, seed // {band_size} AS band_idx,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS band_hash
      FROM mh GROUP BY {id_col}, seed // {band_size}
    )
    SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
           COUNT(*) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.{id_col} < b.{id_col}
    GROUP BY 1, 2
    """
