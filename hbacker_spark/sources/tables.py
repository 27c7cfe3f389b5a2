"""Parquet sources for the driver-generated star schema (TESTDATA.md).

Reads stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown + column pruning on every scan; never collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The testdata events file stores TIMESTAMP(NANOS), which Spark
        # cannot represent — any session that hasn't opted into
        # nanosAsLong fails the read outright. Set it here so queries
        # work under ANY caller-provided session (e.g. the driver's),
        # not just ones from our factory. Runtime-settable; verified.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Driver testdata events.ts is parquet TIMESTAMP(NANOS), surfaced
        # as long nanos via spark.sql.legacy.parquet.nanosAsLong
        # (session.py). Truncate to microseconds — exactly what DuckDB
        # does reading the same file — so oracle comparisons see identical
        # timestamps. Engine-written events parquet already carries a real
        # timestamp column and skips this. Integer division: double
        # division loses ulps at ~1.7e18 ns.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY if the plan is narrower than the
    session's parallelism.

    Explode/regex-heavy pipelines (shingling, tokenizing) multiply work
    per input row; when the source is a single small parquet split the
    whole pipeline otherwise runs in ONE task while 31 cores idle. On a
    real cluster the same table arrives as thousands of splits and this
    is a no-op — the partition probe is driver-side metadata (file
    listing), no job. The repartition shuffles raw input bytes once,
    which the fan-out work then amortizes.
    """
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
