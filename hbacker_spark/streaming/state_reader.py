"""Streaming state-store inspection (Spark 4 built-in readers).

Operational companion to the streaming layer: the ``statestore`` and
``state-metadata`` data sources read a running (or stopped) query's
checkpoint directly, so state can be AUDITED — row counts per operator,
hot keys, watermark lag victims — without instrumenting the query or
replaying the stream. At 100 TB this is how you answer "why is this
stateful query's checkpoint 2 TB" (skewed key? missed watermark
eviction?) from a plain batch DataFrame.

Both readers are batch sources over the checkpoint files: cheap,
read-only, safe to run against a live query's last committed batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
) -> DataFrame:
    """State rows of one operator at one batch (default: latest).

    Returns (key struct, value struct, partition_id) — the raw keyed
    state, e.g. ((window, event_type), count) for a windowed count."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if operator_id:
        r = r.option("operatorId", operator_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator checkpoint metadata: operator ids/names, store
    names, partition counts, min/max committed batch ids — the map of
    what `read_state` can address."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_skew_report(spark: SparkSession, checkpoint: str, operator_id: int = 0) -> DataFrame:
    """Per-partition state row counts for one operator — the first
    thing to look at when a stateful query's checkpoint grows: a flat
    profile means volume, a spiked one means a hot key landed all its
    state on one store partition."""
    return (
        read_state(spark, checkpoint, operator_id=operator_id)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_state_rows"))
        .orderBy("partition_id")
    )
