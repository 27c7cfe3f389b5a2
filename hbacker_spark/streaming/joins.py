"""Stream-stream joins (Structured Streaming).

The one join family the rest of the streaming layer (windows.py) doesn't
cover: BOTH sides unbounded. Spark buffers each side in state and emits
matches as they become possible; two things bound that state, and both
are mandatory here:

- a watermark on each input (how late a row may arrive), and
- a time-range join condition (how far apart matching rows may be).

Together they let the engine evict a buffered row once the other side's
watermark passes ``row.ts + horizon`` — without the range condition the
state grows forever, which is the stream-stream scale failure mode.

Batch-shadow twin: ``stream_join_attribution_shadow`` in
queries/streaming_shadow.py (oracled) — ``join()`` is mode-agnostic, so
the identical function body serves batch DataFrames, and the streaming
test asserts convergence to it.

Reference parity: the reference has no streaming; this is §2.C closure
(Structured Streaming row), same disposition as windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases_to_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each purchase to the same user's clicks in the preceding
    ``horizon`` — the classic attribution stream-stream join.

    Works on streaming AND batch inputs (the streaming path requires the
    watermarks; on batch they're no-ops). ``how='leftOuter'`` emits
    unattributed purchases with NULL click columns once the click-side
    watermark guarantees no match can still arrive.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    joined = p.join(c, cond, how)
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
