"""Approximate streaming twin of `q_quantile_normalize_scores`.

The batch calibration (`queries/sampling.quantile_normalize_docs`) maps
each document's within-source rank percentile to the GLOBAL score at
that percentile — an exact global order statistic, which is inherently
a batch computation (rank needs the whole distribution). The streaming
form substitutes the one non-streamable piece — exact ranks — with the
mergeable equi-width histogram sketch this repo already maintains as a
streaming aggregate (`sketch_stream.hist_stream`): state is exactly
sources × bins rows forever, counts are commutative so micro-batching
cannot change a cell, and both the per-source CDF and the global
inverse CDF become pure functions of the drained sketch.

Error envelope (theorem-backed, pinned in tests/test_streaming.py):

- percentile: every doc in a source bucket shares the estimate
  pct̂ = (cum_before · 10⁴) DIV (n_src − 1); its exact rank lies in
  (cum_before, cum_before + cnt], so
  |pct̂ − pct_exact| ≤ ((cnt − 1) · 10⁴) / (n_src − 1) + 1 — the doc's
  OWN bucket mass in basis points. Finer bins → tighter envelope.
- value: the normalized output is the bucket [lo, hi) of the global
  sketch whose cumulative range covers the target rank; the exact
  global order statistic at that rank lies inside that bucket BY
  CONSTRUCTION of the histogram over the same rows.

Bucketization uses LO=0, HI=2²⁰ (> the 10⁶ ppm score ceiling) so the
bucket width HI/bins is an exact integer at power-of-two bins and every
edge is a BIGINT — no float boundary ambiguity between engines.

At 100 TB: the sketch is the broadcast-sized model (sources × bins
rows); calibrating any batch of documents against the live stream state
is two broadcast joins, no global shuffle — vs the batch twin's
distributed global rank. The trade is the bucket-width envelope above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM_LO = 0
PPM_HI = 1 << 20  # > 10^6 ppm ceiling; integer bucket width at 2^k bins
QN_PCT = 10_000  # basis points, matching the batch twin


def scored_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Stateless projection doc → (doc_id, source, rp_ppm): the integer
    Simpson repeat probability of the batch twin (sorted run-length
    pass, `operators/text.simpson_stats_sql`) — streaming-safe, no
    state."""
    from ..operators.text import _tok_array, simpson_stats_sql

    toks = _tok_array(text_col)
    n = "CAST(size(_toks) AS BIGINT)"
    num = f"{simpson_stats_sql('_toks')}.num"
    return stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.expr(toks).alias("_toks"),
    ).select(
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN {n} < 2 THEN 0L"
            f" ELSE ({num} * 1000000) DIV ({n} * ({n} - 1)) END"
        ).alias("rp_ppm"),
    )


def quantile_hist_stream(stream: DataFrame, bins: int = 256) -> DataFrame:
    """Streaming per-source histogram of rp_ppm — the whole persistent
    state of the calibrator: sources × bins rows, forever."""
    from .sketch_stream import hist_stream

    return hist_stream(
        scored_stream(stream),
        "rp_ppm",
        float(PPM_LO),
        float(PPM_HI),
        bins,
        group_cols=["source"],
    )


def start_quantile_hist(
    stream: DataFrame,
    checkpoint_path: str,
    bins: int = 256,
    table: str = "qn_hist",
    trigger_once: bool = True,
):
    """Run the calibration sketch into an in-memory table in complete
    mode (sketch-sized output, exactly like `start_hist`)."""
    writer = (
        quantile_hist_stream(stream, bins)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def normalize_from_hist(
    hist: DataFrame, scored: DataFrame, bins: int = 256
) -> DataFrame:
    """Calibrate a batch of scored documents (doc_id, source, rp_ppm)
    against a drained calibration sketch (source, bucket, cnt).

    Pure function of the sketch: per-source CDF gives the approximate
    basis-point percentile; the global sketch (per-source counts summed
    — histogram merge is exact) inverts it back to the global bucket
    [norm_lo_ppm, norm_hi_ppm) holding the target order statistic.

    Shuffle shape: two windows over the SKETCH (sources × bins rows; the
    global one is bounded by the explicit limit, the `hist_quantiles`
    pattern), then two joins onto the doc batch whose build sides are
    sketch-sized — broadcastable at any corpus scale."""
    from pyspark.sql import Window

    width = PPM_HI // bins
    if width * bins != PPM_HI:
        raise ValueError(f"bins must divide {PPM_HI} (power of two), got {bins}")

    w_src = Window.partitionBy("source").orderBy("bucket")
    src_cdf = (
        hist.withColumn(
            "cum_through", F.sum("cnt").over(w_src).cast("long")
        )
        .withColumn("cum_before", (F.col("cum_through") - F.col("cnt")))
        .withColumn(
            "n_src",
            F.sum("cnt").over(Window.partitionBy("source")).cast("long"),
        )
        .select(
            "source",
            "bucket",
            F.expr(
                f"CASE WHEN n_src < 2 THEN 0L"
                f" ELSE (cum_before * {QN_PCT}) DIV (n_src - 1) END"
            ).alias("pctile_bp"),
        )
    )

    # global sketch: merge per-source counts; bounded by construction
    # (buckets clamp to [0, bins-1]) — the limit puts the bound in the
    # plan so the cum-sum window is provably over a bounded frame
    glob = (
        hist.groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("gcnt"))
        .limit(bins + 1)
    )
    w_g = Window.partitionBy().orderBy("bucket")
    glob_cdf = glob.withColumn(
        "gcum_through", F.sum("gcnt").over(w_g).cast("long")
    ).withColumn("gcum_before", F.col("gcum_through") - F.col("gcnt"))

    from ..operators.sketch import _hist_bucket

    docs = scored.withColumn(
        "bucket", _hist_bucket("rp_ppm", float(PPM_LO), float(PPM_HI), bins)
    )
    # LEFT joins: a doc from a source (or cell) the stream has not seen
    # yet must SURVIVE with NULL calibration columns, not silently
    # vanish — the batch twin emits every input doc, and "calibrate any
    # batch" is this function's contract (r7 review finding). Callers
    # treat NULL normalized columns as "sketch has no evidence yet".
    with_pct = docs.join(src_cdf, ["source", "bucket"], "left").select(
        "doc_id", "source", "rp_ppm", "pctile_bp"
    )
    # n_total as a GLOBAL AGGREGATE over the (possibly empty) sketch:
    # a global agg always yields exactly one row — NULL n_total when the
    # sketch is empty — so the crossJoin can never drop docs. (r7 advice
    # finding: selecting n_total from glob_cdf's window column gives a
    # ZERO-row frame on an empty sketch, and the crossJoin silently
    # emptied the whole batch instead of emitting NULL calibration.)
    n_total_1 = glob.agg(F.sum("gcnt").cast("long").alias("n_total"))
    target = with_pct.crossJoin(F.broadcast(n_total_1)).withColumn(
        "target_rank",
        F.expr(f"1 + (pctile_bp * (n_total - 1)) DIV {QN_PCT}"),
    )
    ginv = glob_cdf.select(
        F.col("bucket").alias("gbucket"), "gcum_before", "gcum_through"
    )
    return (
        target.join(
            F.broadcast(ginv),
            (F.col("target_rank") > F.col("gcum_before"))
            & (F.col("target_rank") <= F.col("gcum_through")),
            "left",
        )
        .select(
            "doc_id",
            "source",
            "rp_ppm",
            F.col("pctile_bp").alias("pctile_bp_approx"),
            F.col("gbucket").alias("norm_bucket"),
            (F.col("gbucket") * F.lit(int(width))).cast("long").alias(
                "norm_lo_ppm"
            ),
            ((F.col("gbucket") + 1) * F.lit(int(width))).cast("long").alias(
                "norm_hi_ppm"
            ),
        )
    )
