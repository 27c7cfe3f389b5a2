"""SparkSession factory tuned for correctness-vs-oracle and local bench.

Local mode is a correctness/bench harness; the configs are chosen so the
same code scales on a real cluster: AQE on (runtime re-plan, skew joins,
partition coalescing), shuffle partitions sized to cores locally (on a
cluster this would be ~2-3x total cores), UTC session timezone so
timestamp semantics match the DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hbacker_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus != "*" else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python Data Source row-key pushdown (sources/cells_source.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    # Opt-in FAIR scheduling (SPARK_GRAFT_SCHEDULER=FAIR): the
    # multi-table export pool (snapshots._run_table_jobs) tags each
    # table's jobs with a scheduler-pool local property; under the
    # default FIFO that tag is inert (jobs interleave but the biggest
    # head-of-queue job's stages go first), under FAIR the in-flight
    # tables share executors fairly — the reference's N-worker shape.
    # Must be set at context start, hence a session knob not a per-call
    # one.
    scheduler = os.environ.get("SPARK_GRAFT_SCHEDULER")
    if scheduler:
        builder = builder.config("spark.scheduler.mode", scheduler)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
