"""Watermarked stream-stream join: click→purchase attribution over two
unbounded streams.

The batch form of this query is ``q_asof_purchase_attribution`` /
``q_interval_error_click_window``; this is the Structured Streaming twin:
both sides carry event-time watermarks, and the join predicate bounds the
purchase's timestamp to a window after the click — which is what lets
Spark expire join state (a click older than the watermark minus the
window can never match again, so its state is dropped). Without the time
bound the state would grow without limit; with it, state is
O(active-window rows per side) no matter how long the streams run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join each click to the same user's purchases within
    ``window_seconds`` after it. Works on streaming or batch inputs with
    schema (user_id, ts, event_id, value) — the batch form is the test
    oracle for the streaming form.

    Inputs are aliased internally; output columns are
    (user_id, click_id, click_ts, purchase_id, purchase_ts, value).
    """
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "value"
    )


def start_click_purchase_join(
    events_stream: DataFrame,
    checkpoint_path: str,
    window_seconds: int = 1800,
    watermark: str = "10 minutes",
    queryName: str = "click_purchase",
    trigger_once: bool = True,
):
    """Wire the join over a single events stream (demuxed by event_type)
    into a memory-sink streaming query (swap the sink in deployments)."""
    clicks = events_stream.filter(F.col("event_type") == "click")
    purchases = events_stream.filter(F.col("event_type") == "purchase")
    joined = click_purchase_join(
        clicks, purchases, window_seconds=window_seconds, watermark=watermark
    )
    writer = (
        joined.writeStream.format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
