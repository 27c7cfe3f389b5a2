"""HBase connector source/sink (the BASELINE-stated approach:
"DataFrame read/write via HBase connector").

No HBase cluster or connector jar ships in this container, so the live
path is gated behind availability; everything around it — catalog-json
assembly for the Apache hbase-connectors (hbase-spark) data source,
cells↔wide-row reshaping — is real, deterministic, and unit-tested. On
a cluster with ``org.apache.hbase.connectors.spark`` on the classpath,
``read_table``/``write_table`` work as-is.

Reference parity: this is where the MR Export/Import jobs' role lives
(lib/hbacker/export.rb:150-151, import.rb:141-144) — Spark's connector
scans regions in parallel exactly like 1-map-per-region MR did.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

HBASE_SPARK_FORMAT = "org.apache.hadoop.hbase.spark"


def connector_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hadoop.hbase.spark.DefaultSource")
        return True
    except Exception:  # noqa: BLE001 — any classloader failure = absent
        return False


def hbase_catalog_json(
    table_name: str,
    row_key_col: str,
    columns: dict[str, tuple[str, str, str]],
    namespace: str = "default",
) -> str:
    """Build the hbase-spark catalog JSON mapping DataFrame columns to
    HBase cells. ``columns`` maps df_col -> (cf, qualifier, type)."""
    cols = {row_key_col: {"cf": "rowkey", "col": "key", "type": "string"}}
    for df_col, (cf, qualifier, typ) in columns.items():
        cols[df_col] = {"cf": cf, "col": qualifier, "type": typ}
    return json.dumps(
        {
            "table": {"namespace": namespace, "name": table_name},
            "rowkey": "key",
            "columns": cols,
        }
    )


def read_table(spark: SparkSession, catalog_json: str) -> DataFrame:
    """Live connector read (region-parallel scan with pushdown)."""
    if not connector_available(spark):
        raise RuntimeError(
            "hbase-spark connector not on the classpath; use the parquet "
            "snapshot path (operators.snapshots) or submit with "
            "--packages org.apache.hbase.connectors.spark:hbase-spark"
        )
    return spark.read.format(HBASE_SPARK_FORMAT).option("catalog", catalog_json).load()


def write_table(df: DataFrame, catalog_json: str, new_table_regions: int = 5) -> None:
    if not connector_available(df.sparkSession):
        raise RuntimeError("hbase-spark connector not on the classpath")
    (
        df.write.format(HBASE_SPARK_FORMAT)
        .option("catalog", catalog_json)
        .option("newtable", str(new_table_regions))
        .save()
    )


def cells_to_wide(cells: DataFrame) -> DataFrame:
    """Reshape the cells model (row_key, cf, qualifier, ts, value) into
    one row per row_key with a cf:qualifier → latest value map — the
    DataFrame shape the connector catalog maps onto an HBase row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("row_key", "cf", "qualifier").orderBy(F.col("ts").desc())
    latest = cells.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        latest.groupBy("row_key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.concat_ws(":", "cf", "qualifier").alias("k"), F.col("value").alias("v")))
            ).alias("cells")
        )
    )


def wide_to_cells(wide: DataFrame, ts: int) -> DataFrame:
    """Inverse reshape: explode the cf:qualifier map back into cell rows
    stamped with ``ts`` (a bulk-write's single version timestamp)."""
    from pyspark.sql import functions as F

    exploded = wide.select("row_key", F.explode("cells").alias("k", "value"))
    parts = F.split("k", ":", 2)
    return exploded.select(
        "row_key",
        parts.getItem(0).alias("cf"),
        parts.getItem(1).alias("qualifier"),
        F.lit(ts).cast("long").alias("ts"),
        "value",
    )
