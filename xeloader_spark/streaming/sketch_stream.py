"""Streaming count-min sketch: the relational (d, bucket, cnt) sketch of
operators/sketch.py maintained as a continuously-updating streaming
aggregate.

Because the sketch IS a groupBy over (d, bucket), Structured Streaming
maintains it with its ordinary stateful-aggregation machinery: state is
exactly depth × width rows FOREVER, independent of stream length — the
defining sketch property carries over to streaming for free, no custom
`applyInPandasWithState` operator needed. Each micro-batch folds its rows
into the running counts (map-side partial agg, then a depth × width-row
shuffle), and `complete` output re-emits the whole (tiny) sketch, so a
downstream probe always sees a consistent snapshot.

Equivalence contract (pinned in tests/test_streaming.py): after draining
a bounded input, the streamed sketch equals `cms_build` over the same
rows — count-min is order-insensitive (counts are commutative), so
micro-batching cannot change the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import _bucket_structs


def cms_stream(
    stream: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Streaming sketch build — same explode + groupBy as the batch
    `cms_build`, applied to an unbounded source."""
    return (
        stream.select(
            F.explode(_bucket_structs(key_col, width, depth, salt)).alias("s")
        )
        .select("s.d", "s.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def start_cms(
    stream: DataFrame,
    checkpoint_path: str,
    key_col: str,
    width: int = 64,
    depth: int = 4,
    salt: str = "cms",
    table: str = "cms_sketch",
    trigger_once: bool = True,
):
    """Run the streaming sketch into an in-memory table (`table`) in
    complete mode — legitimate here precisely because the result is
    sketch-sized (depth × width rows), never corpus-sized."""
    writer = (
        cms_stream(stream, key_col, width=width, depth=depth, salt=salt)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hist_stream(
    stream: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming equi-width histogram sketch — same bucketize + groupBy
    COUNT as the batch `hist_build`; counts are commutative, so
    micro-batching cannot change a cell; state is groups × bins rows."""
    from ..operators.sketch import _hist_bucket

    groups = group_cols or []
    return (
        stream.select(
            *groups, _hist_bucket(value_col, lo, hi, bins).alias("bucket")
        )
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def start_hist(
    stream: DataFrame,
    checkpoint_path: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: list[str] | None = None,
    table: str = "hist_sketch",
    trigger_once: bool = True,
):
    """Run the streaming histogram into an in-memory table in complete
    mode (sketch-sized output)."""
    writer = (
        hist_stream(stream, value_col, lo, hi, bins, group_cols=group_cols)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_hll_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    p: int = 6,
    salt: str = "whll",
) -> DataFrame:
    """Per-event-time-window HLL registers — the sketch × window
    composition: distinct-count state per hour is 2^p register rows,
    and the watermark expires whole windows, so total state is
    (horizon/window + 1) × 2^p rows no matter the stream rate. MAX is
    idempotent, so replays can't corrupt a window."""
    from ..operators.sketch import _hll_reg_cols

    idx, rho = _hll_reg_cols(key_col, p, salt)
    return (
        stream.withWatermark(ts_col, watermark)
        # group on the window STRUCT produced from the watermarked column
        # (projecting w.start first severs the watermark linkage and
        # append mode is rejected)
        .groupBy(F.window(ts_col, window).alias("w"), idx)
        .agg(F.max(rho).alias("rho"))
        .select(F.col("w.start").alias("window_start"), "idx", "rho")
    )


def start_windowed_hll(
    stream: DataFrame,
    checkpoint_path: str,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    p: int = 6,
    salt: str = "whll",
    table: str = "windowed_hll",
    trigger_once: bool = True,
):
    writer = (
        windowed_hll_stream(
            stream, key_col, ts_col=ts_col, window=window,
            watermark=watermark, p=p, salt=salt,
        )
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_stream(
    stream: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Streaming HyperLogLog register table — same projection + groupBy
    MAX as the batch `hll_build`. MAX is commutative and idempotent, so
    micro-batch order (and even replayed batches) cannot change the
    registers; state is groups × 2^p rows forever, the sketch-sized
    bound that makes `complete` output legitimate."""
    from ..operators.sketch import _hll_reg_cols

    groups = group_cols or []
    idx, rho = _hll_reg_cols(key_col, p, salt)
    return (
        stream.select(*groups, idx, rho)
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def start_hll(
    stream: DataFrame,
    checkpoint_path: str,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    salt: str = "hll",
    table: str = "hll_sketch",
    trigger_once: bool = True,
):
    """Run the streaming register build into an in-memory table in
    complete mode (register-table-sized output, never corpus-sized)."""
    writer = (
        hll_stream(stream, key_col, group_cols=group_cols, p=p, salt=salt)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
