"""Source/sink closure beyond parquet: CSV, JSON, ORC, XML, binary
files, partitioned writes.

Always schema-explicit (inference is a full extra scan at 100 TB and
types drift); partitioned writes lay out ``col=value`` directories so
later reads partition-prune (the Spark analog of the reference's
per-session snapshot dirs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_xml(spark: SparkSession, path: str, schema: T.StructType, row_tag: str = "row") -> DataFrame:
    """Native XML source (built into Spark 4 from the spark-xml
    donation): one record per ``row_tag`` element, schema-explicit like
    every other reader here. The format legacy enterprise feeds still
    arrive in — this closes the last built-in text format."""
    return spark.read.schema(schema).option("rowTag", row_tag).format("xml").load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("rowTag", row_tag).option("rootTag", root_tag).format("xml").save(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: readers filtering on
    ``partition_cols`` scan only matching directories."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None, max_bytes: int | None = None
) -> DataFrame:
    """Raw-file ingest via Spark's ``binaryFile`` source — the first
    step of a multimodal pipeline: files become (path, modificationTime,
    length, content binary) rows, which ``functions/multimodal``
    decode/feature passes consume directly. The source is
    split-per-file (a file never splits across tasks — binary blobs
    aren't splittable), so task parallelism = file count; at 100 TB of
    small media files, compact first (many small files = driver listing
    pain, same issue compact_snapshot exists for) or ingest once into
    parquet with this reader and serve all downstream passes from the
    columnar copy. ``glob`` filters by pathGlobFilter at listing time
    (never reads non-matching files); ``max_bytes`` pushes a length
    predicate into the file index, skipping oversized blobs before any
    byte is read.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("length") <= max_bytes)
    return df


def avro_available(spark: SparkSession) -> bool:
    """Avro ships as Spark's EXTERNAL module (spark-avro jar) — absent
    from this distribution, same honesty gate as the HBase connector
    (sources/hbase.py). A bare Class.forName is NOT enough here: this
    distribution carries some avro classes (SchemaConverters for the
    from_avro functions) without the DataSourceRegister service entry,
    so the probe must ask Spark's own source resolver."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:  # noqa: BLE001 — any resolution failure = absent
        return False


def read_avro(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    if not avro_available(spark):
        raise RuntimeError(
            "Avro needs the spark-avro module on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark version>); "
            "not shipped in this distribution — see avro_available()"
        )
    return spark.read.schema(schema).format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "Avro needs the spark-avro module on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark version>); "
            "not shipped in this distribution — see avro_available()"
        )
    df.write.mode(mode).format("avro").save(path)
