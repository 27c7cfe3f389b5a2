"""Structured Streaming layer over the events stream.

The same logical window aggregations as the oracle-checked batch shadows
(``queries/streaming_shadow.py``) — ``window()`` / ``session_window()``
are mode-agnostic, so one definition serves both. Here they run under
``readStream`` with watermarks; the micro-batch model is also the Spark
analog of the reference's incremental session chain (SURVEY.md §1.3:
each increment = the cells that arrived since the previous watermark).

Scale notes: streaming state is keyed by (window, event_type) or
(session, user) — bounded by the watermark horizon; late data beyond the
watermark is dropped, mirroring the reference's "end_time = now - 60 s"
in-flight-write safety margin (cli.rb:30-31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over parquet event files (one file per
    micro-batch by default, so tests exercise multi-batch state)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )


def tumbling_counts(events: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str = "append", checkpoint: str | None = None):
    """Drive a bounded file-source stream to completion synchronously into
    an in-memory sink; returns the sink's DataFrame. Test/dev harness —
    production sinks are parquet/foreachBatch. Pass ``checkpoint`` to
    persist source offsets + watermark across successive runs (restart
    semantics)."""
    spark = stream_df.sparkSession
    writer = stream_df.writeStream.outputMode(output_mode).format("memory").queryName(query_name)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_to_snapshots(events: DataFrame, dest_root: str, checkpoint: str, session_prefix: str = "stream"):
    """Streaming sink into session-named snapshot directories via
    foreachBatch — each micro-batch becomes an incremental "session"
    (batch id = the chain position), the streaming analog of
    export_incremental. Exactly-once per batch via the checkpoint.
    """
    from hbacker_spark.operators.snapshots import snapshot_path

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        path = snapshot_path(dest_root, f"{session_prefix}_{batch_id:06d}", "events")
        batch_df.write.mode("overwrite").parquet(path)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedup_first_events(
    events: DataFrame, keys: tuple[str, ...] = ("user_id", "event_type"), watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup: keep the first arrival per key, state bounded by
    the watermark (dropDuplicatesWithinWatermark evicts key state once
    the watermark passes it — the only way streaming dedup survives
    unbounded key cardinality). Batch-shadow twin: the oracled
    `stream_dedup_shadow` query (deterministic first-by-(ts, event_id)).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def enrich_with_dimension(events: DataFrame, dim: DataFrame, on_left: str, on_right: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the static
    dimension snapshot; Spark plans the static side as the build side
    (broadcast under the threshold), so the stream never shuffles on the
    join key. Batch-shadow twin: `stream_static_enrich_shadow`."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), events[on_left] == dim[on_right])
