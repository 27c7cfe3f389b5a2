"""Parquet sources for the driver-generated star schema (TESTDATA.md).

Reads stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown + column pruning on every scan; never collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), surfaced as long nanos via
        # spark.sql.legacy.parquet.nanosAsLong (session.py). Truncate to
        # microseconds — exactly what DuckDB does reading the same file —
        # so oracle comparisons see identical timestamps.
        from pyspark.sql import functions as F

        # integer division — double division loses ulps at ~1.7e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
