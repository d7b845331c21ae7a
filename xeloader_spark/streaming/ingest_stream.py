"""Streaming ingest — the same dataflow as operators.ingest, as a
Structured Streaming job (SURVEY §7.1 M6).

The reference is a batch loader, but its per-event processing is stateless
row projection (SURVEY §1.2 "embarrassingly per-row"), so the identical
transform chain lifts onto a file-source stream unchanged:

    readStream(files) → flatten (S9/S10/S11) → error filter (S26)
    → writeStream partitionBy(event_type) (S8/S18)

plus the windowed aggregate the output schema exists for
(`q_time_bucket_agg`) as a watermarked streaming aggregate.

Scale notes: the file source tracks processed files in the checkpoint (the
streaming analog of the lineage table's dedup role); `maxFilesPerTrigger`
bounds per-micro-batch work; the demux sink and the stateless transforms
keep the stream shuffle-free — only the windowed aggregate keeps state,
bounded by the watermark horizon × group cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.ingest import IngestConfig, flatten_events

# Explicit source schema: streaming sources cannot infer (and the
# reference's XEL+XEM path is exactly this "schema supplied" mode,
# FileProcessor.cs:280-334).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    input_path: str,
    cfg: IngestConfig | None = None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """S1/S2/S4 as a stream: file source with the wildcard gate; provenance
    column included so lineage semantics survive streaming."""
    cfg = cfg or IngestConfig()
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", cfg.file_pattern)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .withColumn("e_source_file", F.input_file_name())
    )


def streaming_flatten(stream: DataFrame, cfg: IngestConfig | None = None) -> DataFrame:
    """The batch flatten (S9/S10/S11) applied verbatim to the stream —
    stateless projections need no changes. Error rows are filtered inline
    (per-file abort needs file-complete knowledge, which a stream does not
    have; the row-level filter is the streaming-consistent subset of S26)."""
    flat = flatten_events(stream, cfg)
    return flat.filter(F.col("e_is_error") == 0)


def start_demux_sink(
    flat: DataFrame,
    output_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """S8/S18 as a streaming sink: event_type-partitioned parquet append.
    `trigger(availableNow)` drains what exists then stops — the batch-
    parity mode used by tests; continuous deployments drop that option."""
    writer = (
        flat.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("event_type")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key while it
    is inside the watermark horizon (`dropDuplicatesWithinWatermark`).

    This is the streaming analog of the lineage table's "skip already-
    loaded input" role (S23) pushed down to row granularity: an at-least-
    once upstream (redelivered files, replayed Kafka offsets) becomes
    exactly-once rows downstream. State is ONE entry per key seen within
    the horizon — bounded by arrival rate × watermark, independent of
    stream lifetime, which is what lets it run forever at cluster scale.
    Dups arriving later than the watermark are passed through (state for
    their key has been reclaimed) — choose the horizon from the
    redelivery window, not from politeness."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def start_windowed_agg(
    stream: DataFrame,
    checkpoint_path: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    trigger_once: bool = True,
):
    """The flagship time-bucket aggregate as a watermarked streaming
    aggregate: late events beyond the watermark are dropped, state is
    bounded by (watermark horizon / window) × #event_types groups."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("memory")
        .queryName("windowed_agg")
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_hopping_agg(
    stream: DataFrame,
    checkpoint_path: str,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "5 minutes",
    table: str = "hopping_agg",
    trigger_once: bool = True,
):
    """Hopping (sliding) windowed aggregate: each event enters
    window/slide overlapping windows map-side; state is
    (horizon/slide + overlap) × #groups windows — the streaming twin of
    `q_hopping_window_agg`."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
