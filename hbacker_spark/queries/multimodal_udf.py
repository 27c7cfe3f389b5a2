"""Multimodal-column queries + the UDF surface (SURVEY.md §2.C rows 3,
"UDF/UDAF surface"): one row-at-a-time Python UDF (U2 parity), one
vectorized pandas_udf, one applyInPandas grouped-map UDAF, and the
multimodal pipeline over the documents-as-media adapter.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbacker_spark.functions import multimodal as MM
from hbacker_spark.registry import register
from hbacker_spark.sources.tables import load_table


@register(
    "udf_canonicalize_labels",
    oracle="""
    SELECT p_partkey,
           regexp_replace(lower(p_brand || '.' || p_name), '[-#. ]', '_', 'g') AS canonical
    FROM part
    """,
    tags=("udf",),
    doc="U2 as a row-at-a-time Python UDF (cli.rb:354 host.gsub) — the "
    "deliberately-slow-path twin of canonicalize_part_labels; kept tiny "
    "and off the hot path, exists to pin down UDF semantics parity.",
)
def udf_canonicalize_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.StringType())
    def canon(brand: str, name: str) -> str:
        return re.sub(r"[-#. ]", "_", f"{brand}.{name}".lower())

    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", canon("p_brand", "p_name").alias("canonical"))


@register(
    "pandas_udf_net_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    tags=("udf", "pandas"),
    doc="Vectorized pandas_udf (Arrow batches): per-row net price. Raw "
    "IEEE double ops are order-free per row → exact oracle parity "
    "(no rounding: pandas rounds half-even, SQL half-away).",
)
def pandas_udf_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def net(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_orderkey", "l_linenumber", net("l_extendedprice", "l_discount").alias("net_price"))


@register(
    "applyinpandas_value_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS z
    FROM events
    """,
    tags=("udf", "pandas", "udaf"),
    doc="Grouped-map UDAF via applyInPandas: per-event_type z-score of "
    "value. One shuffle on the group key; pandas sees each group whole. "
    "Oracled: the group is SORTED by event_id inside the UDF before "
    "mean/std, making the pandas summation order deterministic (group "
    "arrival order is not); at round-6 the engines agree on every row "
    "of the testdata (verified at sf0.001/0.01/0.1), and both sides "
    "are deterministic, so the parity is stable, not a lucky draw.",
)
def applyinpandas_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["z"] = ((pdf["value"] - mu) / sd if sd else 0.0).round(6)
        return out

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").applyInPandas(zscore, schema="event_id long, event_type string, z double")


@register(
    "multimodal_meta_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           COUNT(*) AS n,
           CAST(SUM(CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(SUM(n_chars * 40) AS BIGINT) AS total_duration_ms
    FROM documents
    GROUP BY 1
    """,
    tags=("multimodal", "aggregation"),
    doc="Typed-metadata aggregation over opaque binary media columns "
    "(documents-as-media adapter): per-modality byte/duration totals.",
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes"),
        F.sum(F.col("meta.duration_ms").cast("bigint")).alias("total_duration_ms"),
    )


@register(
    "multimodal_features",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, g.i AS i,
             CAST(('0x' || substr(md5(text), 2 * g.i + 1, 2)) AS BIGINT) AS byte
      FROM documents CROSS JOIN generate_series(0, {MM.FEATURE_DIM - 1}) AS g(i)
    )
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST({MM.FEATURE_DIM} AS INT) AS dim,
           string_agg(CAST(byte AS VARCHAR), ',' ORDER BY i) AS feature_fp
    FROM b
    GROUP BY doc_id
    """,
    tags=("multimodal", "udf"),
    doc="Decode+embed every media row via Arrow-batched mapInPandas "
    "(deterministic fake decoder standing in for PIL/ffmpeg). FULLY "
    "oracled since r6: the fake decode is an md5-HEX digest chain "
    "(byte k of md5(content) / 256), so DuckDB rebuilds the identical "
    "feature bytes; the declared query projects the per-position byte "
    "fingerprint (features*256 — exact in float32, integer-formatted so "
    "no cross-engine float-printing hazard). The raw array<float> "
    "stays on the MM.extract_features API; with a real decoder "
    "(SPARK_GRAFT_REAL_DECODE=pil) this query intentionally leaves the "
    "oracle's domain.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = MM.extract_features(media)
    # features are exact multiples of 1/256, so *256 recovers the chain
    # byte exactly in float32 — integer strings, no float formatting
    fingerprint = F.concat_ws(
        ",",
        F.transform(
            F.col("features"),
            lambda v: F.round(v.cast("double") * 256).cast("bigint").cast("string"),
        ),
    )
    return feats.select(
        "media_id",
        "modality",
        F.size("features").cast("int").alias("dim"),
        fingerprint.alias("feature_fp"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, text, n_chars * 40 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT media_id, text,
             unnest(generate_series(0,
               CAST(floor(LEAST(duration_ms / 1000.0, 3)) AS BIGINT))) AS frame_idx
      FROM v
    )
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * 1000 AS BIGINT) AS frame_ts_ms,
           md5(text || '|frame|' || CAST(frame_idx AS VARCHAR)) AS frame
    FROM f
    """,
    tags=("multimodal", "udf"),
    doc="Video frame sampling: bounded JVM-side explode per video, frame "
    "decode in Arrow batches; returns (media_id, frame_idx, ts, frame). "
    "FULLY oracled since r6: frame digests are md5-hex of "
    "content|frame|idx, rebuilt verbatim by DuckDB over the same "
    "bounded explode (stride 1000 ms, max 4 frames).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    return MM.sample_frames(media, every_ms=1000, max_frames=4)


@register(
    "udtf_chunk_documents",
    oracle="""
    WITH ks AS (
      SELECT doc_id, text,
             unnest(generate_series(0, CAST(ceil(length(text) / 150.0) AS INT) - 1)) AS k
      FROM documents WHERE length(text) > 0)
    SELECT doc_id, CAST(k AS INT) AS chunk_idx,
           substr(text, 150 * CAST(k AS INT) + 1, 200) AS chunk
    FROM ks
    """,
    tags=("udf", "udtf", "chunking"),
    doc="Python UDTF (Spark 4 user-defined TABLE function) in a LATERAL "
    "join: each document expands to overlapping 200-char chunks at "
    "stride 150 — one Python process per Arrow batch, rows fan out "
    "inside the executor, never through the driver. Same deliberate "
    "semantics-pin role as udf_canonicalize_labels: the built-in twin "
    "is doc_chunk_windows (explode over sequence), which is the hot "
    "path; the UDTF is the escape hatch for chunkers whose logic "
    "outgrows SQL (tokenizer-aware splitting, sentence boundaries).",
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class Chunker:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF signature
            if not text:
                return
            start, i = 0, 0
            while start < len(text):
                yield (i, text[start : start + 200])
                start += 150
                i += 1

    spark.udtf.register("hbacker_chunker", Chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM _udtf_docs d, LATERAL hbacker_chunker(d.doc_id, d.text) c"
    )
