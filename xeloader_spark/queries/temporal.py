"""Temporal query surface: as-of join, interval join, gap-filled rollup,
and sketch-based approximate aggregates over the ``events`` fixture.

These are the time-series queries the reference's three-timestamp schema
exists to serve (XELoader/InputParameters.cs:622-626): "what happened just
before X", "what happened within the window after X", and dense
time-bucketed graphs. The approximate-distinct queries are the 100 TB
variant of count-distinct: mergeable sketches instead of an exact
global shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import sketch as _sk
from ..operators.temporal import (
    asof_join,
    funnel,
    interval_join,
    rollup_gapfill,
    scd2_history,
)
from .core import _dsum


def q_asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the most recent purchase by the same user at or
    before the click (classic attribution as-of join). Single shuffle on
    user_id via the merge-join formulation — no range explosion."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    res = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_cols=["purchase_event_id", "purchase_value"],
        tie_col="purchase_event_id",
        suffix="_purchase",
    )
    return res.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_purchase").alias("purchase_ts"),
        "purchase_event_id",
        "purchase_value",
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: how many users reached each step
    in strict timestamp order, plus the exact total first-view→first-
    qualifying-purchase time (microseconds, BIGINT) over converted users.
    One shuffle on user_id regardless of funnel depth (layered running
    windows over a single window spec)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = funnel(ev, steps=("view", "click", "purchase"))
    return per_user.agg(
        F.count("t_1").alias("n_step1_view"),
        F.count("t_2").alias("n_step2_click"),
        F.count("t_3").alias("n_step3_purchase"),
        F.sum(
            F.when(
                F.col("t_3").isNotNull(),
                F.unix_micros("t_3") - F.unix_micros("t_1"),
            )
        ).alias("total_conv_us"),
    )


def q_interval_error_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, how many clicks the same user made within
    the 120 s window starting at the error — a point-in-interval join,
    executed as a bucketed equi-join (no nested loop). Errors with no
    clicks stay at 0 via the join back to the interval set."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 120 SECONDS")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    hits = interval_join(
        clicks,
        errors,
        on="user_id",
        point_ts="click_ts",
        bucket_seconds=120,
    )
    counts = hits.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return (
        errors.select("error_id", "user_id", "start_ts")
        .join(counts, "error_id", "left")
        .withColumn("n_clicks", F.coalesce(F.col("n_clicks"), F.lit(0).cast("long")))
    )


def q_rollup_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rollup on a dense spine: every (event_type, hour)
    between the first and last observed hour, zero-filled counts and
    LOCF-filled sums — the "hypertable rollup" graphing query."""
    ev = load_table(spark, sf_dir, "events")
    return rollup_gapfill(
        ev,
        ts_col="ts",
        bucket_seconds=3600,
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "sum_value"),
        ],
        zero_cols=["n_events"],
        locf_cols=["sum_value"],
    )


def q_sessionize_gap_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a batch plan: a session breaks after
    30 minutes of per-user inactivity. Two windows over ONE shuffle on
    user_id (lag → boundary flag → running sum), then a per-session
    aggregate. The streaming twin (streaming/sessionize.py,
    applyInPandasWithState) computes the same sessions incrementally;
    this batch form is the oracle-checkable anchor for those semantics."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select("user_id", "ts", "event_id").withColumn(
        "new_s",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn(
        "session_idx", F.sum("new_s").over(wsum).cast("long")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000)
        ).alias("duration_sec"),
    )


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregate (vs the window-function
    formulation in q_sessionize_gap_batch): one hash-aggregate with a
    dynamic-gap session key, no lag/running-sum chain. Boundary semantics
    differ from the custom sessionizer by design: session_window closes
    when gap >= gapDuration (end = last event + gap), replayed exactly in
    the oracle. Same single shuffle on user_id; this is the form that
    also runs unchanged as a streaming aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def q_moving_avg_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-second moving sum/avg per user — a RANGE frame over
    event time (not a row count), the smoothing query behind rate graphs.
    Frame bounds are on unix micros, so peers and boundaries are exact;
    the sum uses the decimal accumulator so frame evaluation order can't
    change the float result."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-30_000_000, 0)
    )
    dsum = F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        dsum.alias("sum_30s"),
        cnt.alias("n_30s"),
        (dsum / cnt).alias("avg_30s"),
    )


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (median + p90) — the
    latency-distribution query a trace store serves. Both engines sort the
    same doubles and interpolate lower + (upper-lower)*frac, so the result
    is bit-exact cross-engine (verified, incl. non-representable
    interpolants). At 100 TB the approx_percentile sketch replaces this;
    the exact form is the correctness anchor."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value"),
        F.expr("percentile(value, 0.9)").alias("p90_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute deviation
    (MAD) flagging — |value − median| > 3·MAD. Two aggregate passes (the
    median must exist before deviations can), each a 5-row result that
    broadcasts back; the corpus is scanned twice, shuffled never (joins
    are broadcast, aggregates are map-side partial). Exact percentiles
    make it cross-engine bit-exact; at 100 TB swap in approx_percentile
    for the two aggregations."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 3 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge/upsert sink semantics: latest event per user — the "target
    table holds current state" load mode a warehouse MERGE performs.
    One max-of-struct aggregate (ts, then event_id tie-break), so the
    shuffle carries map-side-combined partials — one surviving row per
    key per map task — instead of a per-key sort, which is what lets an
    upsert over 100 TB of history behave like a count(*)."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("m")
    )
    return latest.select(
        "user_id",
        F.col("m.ts").alias("ts"),
        F.col("m.event_id").alias("event_id"),
        F.col("m.event_type").alias("event_type"),
        F.col("m.value").alias("value"),
    )


def q_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC MERGE over the event stream read as a change log
    (signup→INSERT, error→DELETE, else UPDATE on the user key): the
    surviving per-user snapshot plus the op-mix audit
    (`operators/temporal.py` `cdc_apply` — one max-of-struct shuffle,
    delete-wins-last semantics, replay-idempotent)."""
    from ..operators.temporal import cdc_apply

    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
    )
    return cdc_apply(
        log,
        key_cols=["user_id"],
        seq_cols=["ts", "event_id"],
        op_col="op",
        payload_cols=["value"],
    )


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type approximate distinct users (HyperLogLog++): the scale path
    for count-distinct — partial sketches merge instead of shuffling every
    key. The estimator's internals can't replay in SQL, so the
    driver-checked output is the sketch's accuracy CONTRACT: the exact
    distinct count (oracle-checkable) plus a boolean pinning the estimate
    within 5% of it (HLL++ default rsd). The raw estimate stays out of the
    hashed output; pytest pins it numerically."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(F.approx_count_distinct("user_id") - F.countDistinct("user_id"))
            <= F.countDistinct("user_id") * 0.05
        ).alias("approx_within_5pct"),
    )


def q_approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles per event type — the 100 TB replacement
    for exact percentile (mergeable digest instead of a global sort).
    Driver-checked as a rank-accuracy contract: the sketch's median must
    land inside the exact [p40, p60] value envelope and its p90 inside
    [p85, p95] (both envelopes are exact-SQL-computable). Numeric
    estimates are pinned in pytest."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("percentile_approx(value, 0.5)")
        .between(F.expr("percentile(value, 0.40)"), F.expr("percentile(value, 0.60)"))
        .alias("median_in_p40_p60"),
        F.expr("percentile_approx(value, 0.9)")
        .between(F.expr("percentile(value, 0.85)"), F.expr("percentile(value, 0.95)"))
        .alias("p90_in_p85_p95"),
    )


def q_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Datasketches HLL: per-type sketches built once, then
    UNIONED into a global estimate — the pattern that lets 1000 executors
    (or 1000 days of partial aggregates) combine distinct-counts without
    re-scanning. Driver-checked contract: exact global distinct
    (oracle-checkable) + a boolean pinning the merged estimate within 5%.
    Sketch numerics are pinned in pytest."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_total_users"),
        F.count(F.lit(1)).alias("n_types"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_total_users"))
    return merged.crossJoin(exact).select(
        "n_types",
        "exact_total_users",
        (
            F.abs(F.col("approx_total_users") - F.col("exact_total_users"))
            <= F.col("exact_total_users") * 0.05
        ).alias("merged_within_5pct"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle over the event stream: first-seen-day
    cohorts × active-day offsets × distinct users."""
    from ..operators.temporal import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev)


_CMS_W, _CMS_D = 64, 4


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational count-min sketch, EXACT-checked end-to-end: two partial
    sketches (even/odd event ids) are built and MERGED, then probed for
    the true top-10 users. The oracle computes ONE global sketch — a
    hash-match therefore proves merge ≡ build (the mergeable-state
    contract) and the probe arithmetic, not just a tolerance. 150 users
    into 64 buckets forces real collisions, so estimates genuinely
    overestimate; `never_underestimates` pins the CMS invariant."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    parts = [
        sk.cms_build(
            ev.filter(F.col("event_id") % 2 == p), "user_id", _CMS_W, _CMS_D
        )
        for p in (0, 1)
    ]
    merged = sk.cms_merge(*parts)
    true_top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("user_id"))
        .limit(10)
    )
    est = sk.cms_estimate(merged, true_top, "user_id", _CMS_W, _CMS_D)
    return true_top.join(est, "user_id").select(
        "user_id",
        "true_n",
        "cms_est",
        (F.col("cms_est") >= F.col("true_n")).alias("never_underestimates"),
    )


def q_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's gap-filled hourly count
    series (`operators/temporal.py` `lag1_autocorrelation`): integer
    sufficient statistics plus one pinned-order multiply/sqrt/divide —
    IEEE sqrt is correctly rounded, so the double matches bit-for-bit."""
    from ..operators.temporal import lag1_autocorrelation

    ev = load_table(spark, sf_dir, "events")
    return lag1_autocorrelation(ev, keys=("event_type",))


def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift between the first and second half of the stream's
    time range: per-type share deltas and the global total-variation
    distance (`operators/temporal.py` `distribution_drift` — log-free,
    cross-multiplied exact integers, one IEEE division per value)."""
    from ..operators.temporal import distribution_drift

    ev = load_table(spark, sf_dir, "events")
    return distribution_drift(ev, cat_col="event_type")


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 328.0, 64
_HIST_PCTS = [25, 50, 90]


def q_hist_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch per event type —
    the third sketch next to CMS (frequency) and HLL (cardinality),
    same relational contract: two partial sketches (even/odd event ids)
    are built and MERGED, then the p25/p50/p90 estimator runs on the
    merged table. The oracle builds ONE global sketch and replays
    bucketization, ranks, and interpolation — a hash match proves
    merge ≡ build plus the whole estimator, not a tolerance."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    parts = [
        sk.hist_build(
            ev.filter(F.col("event_id") % 2 == p_),
            "value",
            _HIST_LO,
            _HIST_HI,
            _HIST_BINS,
            ["event_type"],
        )
        for p_ in (0, 1)
    ]
    merged = sk.hist_merge(*parts)
    return sk.hist_quantiles(
        merged, _HIST_PCTS, _HIST_LO, _HIST_HI, _HIST_BINS
    )


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type on EXACT quartiles from
    the two-pass refinement (no global sort) — the box-plot rule
    composed from `exact_quantile_twopass`: fences Q1 − 1.5·IQR /
    Q3 + 1.5·IQR (1.5 is dyadic → multiplication exact), strict
    exceedance counted. Complements the MAD family with the classic
    quartile formulation."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    q1 = sk.exact_quantile_twopass(
        ev, "value", 25, _HIST_LO, _HIST_HI, _HIST_BINS, ["event_type"]
    ).select("event_type", F.col("exact_value").alias("q1"))
    q3 = sk.exact_quantile_twopass(
        ev, "value", 75, _HIST_LO, _HIST_HI, _HIST_BINS, ["event_type"]
    ).select("event_type", F.col("exact_value").alias("q3"))
    fences = q1.join(q3, "event_type").select(
        "event_type",
        "q1",
        "q3",
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    j = ev.join(F.broadcast(fences), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.first("q1").alias("q1"),
        F.first("q3").alias("q3"),
        F.sum((F.col("value") < F.col("lo")).cast("long"))
        .cast("long")
        .alias("n_low_outliers"),
        F.sum((F.col("value") > F.col("hi")).cast("long"))
        .cast("long")
        .alias("n_high_outliers"),
    )


def q_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for the events⋈anything-on-user_id family —
    the numbers a planner (or `skew.salted_join` caller) consults before
    choosing a strategy: key cardinality, hottest-key share, and the
    Gini-Simpson concentration of the key distribution, all exact
    integer rationals (`operators/text.py` `category_diversity` over a
    single global group)."""
    from ..operators.text import category_diversity

    ev = load_table(spark, sf_dir, "events").withColumn("_g", F.lit("all"))
    return category_diversity(ev, "_g", "user_id").select(
        "n_rows",
        F.col("n_cats").alias("n_keys"),
        F.col("top_n").alias("top_key_rows"),
        "gini_simpson",
        "top_share",
    )


def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase credits the event type
    that OPENED its session (30-min gap sessionization, same boundary
    rule as `q_sessionize_gap_batch`) — the marketing-analytics join of
    sessionize + window-first + conditional aggregate. Counts integer,
    revenue through the decimal accumulator; session boundaries and the
    first-event pick are totally ordered by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_s",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn(
        "session_idx", F.sum("new_s").over(wsum).cast("long")
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy(
        "ts", "event_id"
    )
    attributed = sess.withColumn(
        "first_touch", F.first("event_type").over(ws)
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


def q_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup integrity: the DAILY aggregate computed by
    re-aggregating the stored HOURLY rollup — never the raw events. The
    oracle computes days directly from raw, so a hash match proves the
    hour→day re-aggregation is lossless (the cube-hierarchy property
    that lets a 100 TB warehouse serve every coarser grain from the
    finest stored one)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("_dsum"),
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", F.col("bucket_ts")).alias("day_ts"),
            "event_type",
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("_dsum").cast("decimal(25,6)").alias("_dsum"),
        )
    )
    return daily.select(
        "day_ts",
        "event_type",
        "n_events",
        F.col("_dsum").cast("double").alias("sum_value"),
    )


def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-metric bounce rate per entry channel: sessions (30-min gap,
    same rule as the sessionizer family) grouped by their FIRST event
    type; a bounce is a single-event session. Counts integer, rate is
    one IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_s",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn(
        "session_idx", F.sum("new_s").over(wsum).cast("long")
    )
    per_session = sess.groupBy("user_id", "session_idx").agg(
        F.min(F.struct("ts", "event_id", "event_type")).alias("first"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy(
        F.col("first.event_type").alias("entry_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long"))
        .cast("long")
        .alias("n_bounces"),
        (
            F.sum((F.col("n_events") == 1).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("bounce_rate"),
    )


def q_weekly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly activity profile per event type — day-of-week derived as
    (epoch_us div 86 400 000 000) mod 7 (0 = the epoch's Thursday):
    pure integer arithmetic because the engines' dayofweek()/ISO
    conventions disagree (the scalars battery deliberately excludes
    them); counts + decimal sums per cell."""
    ev = load_table(spark, sf_dir, "events")
    dow = F.expr("(unix_micros(ts) div 86400000000) % 7").cast("long")
    return ev.groupBy(dow.alias("epoch_dow"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_value"),
    )


def q_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime summary — the entity-profile rollup a CRM-style
    consumer reads: first/last seen, span in exact seconds, distinct
    active days, event count, distinct types touched. One aggregate,
    everything integer/timestamp-exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000)
        ).alias("lifetime_sec"),
        F.countDistinct(F.expr("cast(ts as date)"))
        .cast("long")
        .alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival-time statistics over the global event
    stream order (ts, event_id): min/max/total gap in exact
    microseconds plus the mean as one IEEE division — the arrival-
    process profile behind the Fano/autocorrelation diagnostics."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    ).alias("gap_us")
    g = ev.select("event_type", gap).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
        (
            F.sum("gap_us").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_gap_us"),
    )


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the stored hourly
    rollup of 'old' events (event_id % 4 != 0) merged with the partial
    aggregate of the 'new' micro-batch (event_id % 4 = 0) by union +
    re-aggregate — never rescanning the old raw data. The oracle
    recomputes from ALL raw events, so a hash match PROVES delta-merge ≡
    full recompute: counts are sums and the decimal value accumulator is
    exact, so associativity holds bit-for-bit (the property that lets a
    100 TB rollup absorb a daily delta in delta-sized work)."""
    ev = load_table(spark, sf_dir, "events")

    def rollup(df):
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("_dsum"),
        )

    old = rollup(ev.filter(F.col("event_id") % 4 != 0))
    new = rollup(ev.filter(F.col("event_id") % 4 == 0))
    merged = (
        old.unionByName(new)
        .groupBy("bucket_ts", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("_dsum").cast("decimal(25,6)").alias("_dsum"),
        )
    )
    return merged.select(
        "bucket_ts",
        "event_type",
        "n_events",
        F.col("_dsum").cast("double").alias("sum_value"),
    )


def q_hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows via the native `window(ts, '2 hours',
    '1 hour')` — every event lands in exactly two epoch-aligned
    overlapping windows, the moving-aggregate view a monitoring
    dashboard reads. Counts are integers; sums go through the decimal
    accumulator; the oracle replays the two-window assignment as a
    UNION of hour-truncated shifts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
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


def q_exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type median without a global sort: the histogram
    sketch locates the rank-carrying bucket (pass 1), then only that
    bucket's rows — expected N/bins of the group — are ranked locally
    (pass 2). k-th-smallest-VALUE semantics make the answer
    well-defined under duplicates and engine-independent; the oracle
    computes the same rank over a full sort, so the hash match proves
    the two-pass refinement finds the true order statistic
    (`operators/sketch.py` `exact_quantile_twopass`)."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    return sk.exact_quantile_twopass(
        ev, "value", 50, _HIST_LO, _HIST_HI, _HIST_BINS, ["event_type"]
    )


_HLL_P = 6  # m = 64 registers: real estimator regime at sf0.01 scale


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational HyperLogLog distinct-user estimate per event type,
    EXACT-checked end-to-end like the CMS twin above: two partial
    register tables (even/odd event ids) are built and MERGED via
    union+MAX, then fed to the estimator. The oracle computes ONE
    global sketch and replays the register math and the pinned-order
    double estimator bit-for-bit — a hash match proves merge ≡ build
    (mergeable-state contract) plus the estimator arithmetic, not a
    tolerance. Exact distincts ride along for scale-readable error."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    parts = [
        sk.hll_build(
            ev.filter(F.col("event_id") % 2 == p_),
            "user_id",
            ["event_type"],
            p=_HLL_P,
        )
        for p_ in (0, 1)
    ]
    merged = sk.hll_merge(*parts)
    est = sk.hll_estimate(merged, p=_HLL_P)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "regs_hit",
        "zero_regs",
        "zsum",
        "hll_est",
        "lc_regime",
        "exact_users",
    )


def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over user "baskets": for every unordered
    pair of event types, the number of users exhibiting both (support)
    and the lift n_ab·N / (n_a·n_b) — the frequent-itemset signal.
    Baskets collapse to distinct (user, type) rows first, so supports
    are user counts, not event counts; all integers, lift is two pinned
    multiplies and one division. Scale: one distinct shuffle, a
    per-user pair expansion bounded by (distinct types per user choose
    2) ≤ C(5,2), then a types²-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()
    singles = ut.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    lift = (
        F.col("n_both").cast("double") * F.lit(n_users).cast("double")
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.lit(n_users).cast("long").alias("n_users"),
            lift.alias("lift"),
        )
    )


def q_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix between the event types'
    gap-filled hourly count series (`operators/temporal.py`
    `series_correlation` — exact integer statistics, IEEE-pinned r)."""
    from ..operators.temporal import series_correlation

    ev = load_table(spark, sf_dir, "events")
    return series_correlation(ev)


def q_json_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload surface: the events `props` JSON column
    parsed in-plan (`get_json_object` path extraction, typed cast) and
    aggregated per event type — the "query the raw payload without a
    schema migration" capability every event loader needs. Counts and
    integer sums are exact; parse failures surface as a counted column
    instead of silent nulls."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).cast("long").alias("n_unparsed"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).cast("long").alias("min_k"),
        F.max(k).cast("long").alias("max_k"),
        F.countDistinct(k).cast("long").alias("distinct_k"),
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix over per-user sequences
    (`operators/temporal.py` `markov_transitions` — integer counts, one
    IEEE division per probability)."""
    from ..operators.temporal import markov_transitions

    ev = load_table(spark, sf_dir, "events")
    return markov_transitions(ev)


def q_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation without touching either table: the
    CMS inner-product bound min_d Σ_b a[d][b]·b[d][b] ≥ |A ⋈ B| (the
    planner-side use of count-min sketches). Sketches of events.user_id
    and orders.o_custkey — two depth×width tables — produce the
    estimate; the exact join size rides along and `never_underestimates`
    pins the bound. All integer, fully replayed by the oracle."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    sk_a = sk.cms_build(ev, "user_id", _CMS_W, _CMS_D, salt="js")
    sk_b = sk.cms_build(orders, "o_custkey", _CMS_W, _CMS_D, salt="js")
    est = sk.cms_inner_product(sk_a, sk_b)
    exact = (
        ev.select(F.col("user_id").alias("k"))
        .join(orders.select(F.col("o_custkey").alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_join_size"))
    )
    return est.crossJoin(exact).select(
        "exact_join_size",
        "join_size_est",
        (F.col("join_size_est") >= F.col("exact_join_size")).alias(
            "never_underestimates"
        ),
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history of each user's event_type stream:
    one row per consecutive run of equal values with validity bounds,
    dense version numbers and run lengths (`operators/temporal.py`
    `scd2_history`). Single shuffle on user_id; plan pinned."""
    events = load_table(spark, sf_dir, "events")
    return scd2_history(
        events,
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        seq_col="event_id",
    )


def q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: |click ∩ purchase| users estimated by
    inclusion-exclusion over three HLL estimates (est_a + est_b −
    est_union, the union sketch being the register-wise MAX merge).
    Every input estimate is the pinned-order exact-replay estimator, so
    the derived intersection is engine-exact too; the true intersection
    rides along. The union registers never rescan raw data — the merge
    IS the algebra."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    sk_a = sk.hll_build(a, "user_id", p=_HLL_P)
    sk_b = sk.hll_build(b, "user_id", p=_HLL_P)
    est_a = sk.hll_estimate(sk_a, p=_HLL_P).select(
        F.col("hll_est").alias("est_click")
    )
    est_b = sk.hll_estimate(sk_b, p=_HLL_P).select(
        F.col("hll_est").alias("est_purchase")
    )
    est_u = sk.hll_estimate(sk.hll_merge(sk_a, sk_b), p=_HLL_P).select(
        F.col("hll_est").alias("est_union")
    )
    exact = (
        a.select("user_id")
        .distinct()
        .join(b.select("user_id").distinct(), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            "est_click",
            "est_purchase",
            "est_union",
            (
                F.col("est_click")
                + F.col("est_purchase")
                - F.col("est_union")
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the versioned dimension:
    every error event picks up the SCD2 version that was ACTIVE at its
    timestamp — the classic "join facts to the dimension as it was
    then" warehouse query, composed from two native operators
    (`scd2_history` → `asof_join` backward on effective_from). The
    dimension derives from the same stream, so the active run must be
    the one containing the event — pinned as `consistent`, making the
    whole composition self-checking on top of the oracle replay."""
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    dim = scd2_history(
        ev, key_col="user_id", attr_col="event_type",
        ts_col="ts", seq_col="event_id",
    ).select(
        "user_id",
        "effective_from",
        F.col("event_type").alias("dim_state"),
        "version",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        errors,
        dim,
        on="user_id",
        left_ts="ts",
        right_ts="effective_from",
        right_cols=["dim_state", "version"],
        direction="backward",
        tie_col="version",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("effective_from_right").alias("effective_from"),
        "dim_state",
        F.col("version").cast("long").alias("version"),
        (F.col("dim_state") == F.lit("error")).alias("consistent"),
    )


_SCD2_SQL = """
        WITH ordered AS (
            SELECT user_id, ts, event_type,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS rn,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_attr,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_total
            FROM events
        ),
        changes AS (
            SELECT * FROM ordered
            WHERE prev_attr IS DISTINCT FROM event_type
        )
        SELECT user_id, event_type,
               ts AS effective_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY rn)
                   AS effective_to,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn)
                   AS BIGINT) AS version,
               CAST(COALESCE(LEAD(rn) OVER (PARTITION BY user_id ORDER BY rn),
                             n_total + 1) - rn AS BIGINT) AS n_events
        FROM changes
"""

ORACLES: dict[str, str] = {
    "q_scd2_history": _SCD2_SQL,
    "q_scd2_pointintime": f"""
        WITH scd AS ({_SCD2_SQL}),
        err AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'error'
        ),
        j AS (
            SELECT e.event_id, e.user_id, e.ts,
                   s.effective_from, s.event_type AS dim_state, s.version,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY s.effective_from DESC, s.version DESC
                   ) AS rk
            FROM err e
            JOIN scd s ON s.user_id = e.user_id
                      AND s.effective_from <= e.ts
        )
        SELECT event_id, user_id, ts, effective_from, dim_state,
               CAST(version AS BIGINT) AS version,
               dim_state = 'error' AS consistent
        FROM j WHERE rk = 1
    """,
    "q_retention_cohorts": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        f AS (
            SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
        )
        SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', f.cohort_day, d.day) AS BIGINT)
                   AS age_days,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM days d JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    "q_funnel_conversion": """
        WITH l1 AS (
            SELECT user_id, ts, event_type, event_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS t_1
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        l2 AS (
            SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_1
                               THEN ts END) OVER w AS t_2
            FROM l1
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        l3 AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_2
                               THEN ts END) OVER w AS t_3
            FROM l2
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        per_user AS (
            SELECT user_id, MIN(t_1) AS t_1, MIN(t_2) AS t_2, MIN(t_3) AS t_3
            FROM l3 GROUP BY 1
        )
        SELECT CAST(COUNT(t_1) AS BIGINT) AS n_step1_view,
               CAST(COUNT(t_2) AS BIGINT) AS n_step2_click,
               CAST(COUNT(t_3) AS BIGINT) AS n_step3_purchase,
               CAST(SUM(CASE WHEN t_3 IS NOT NULL
                             THEN epoch_us(t_3) - epoch_us(t_1) END)
                    AS BIGINT) AS total_conv_us
        FROM per_user
    """,
    "q_distribution_drift": """
        WITH bounds AS (
            SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
            FROM events
        ),
        c AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN epoch_us(ts) <= b.mid_us
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
                   CAST(SUM(CASE WHEN epoch_us(ts) > b.mid_us
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_second
            FROM events, bounds b GROUP BY 1
        ),
        t AS (
            SELECT event_type, n_first, n_second,
                   CAST(abs(n_first * SUM(n_second) OVER ()
                            - n_second * SUM(n_first) OVER ())
                        AS BIGINT) AS cross_diff,
                   CAST(SUM(n_first) OVER () AS BIGINT) AS na,
                   CAST(SUM(n_second) OVER () AS BIGINT) AS nb
            FROM c
        )
        SELECT event_type, n_first, n_second, cross_diff,
               CAST(cross_diff AS DOUBLE) / CAST(na * nb AS DOUBLE)
                   AS share_delta,
               CAST(SUM(cross_diff) OVER () AS DOUBLE)
                   / CAST(2 * na * nb AS DOUBLE) AS tvd_total
        FROM t
    """,
    "q_iqr_outliers": """
        WITH r AS (
            SELECT event_type, CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY CAST(value AS DOUBLE)) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM events
        ),
        f AS (
            SELECT a.event_type, a.v AS q1, b.v AS q3,
                   a.v - 1.5 * (b.v - a.v) AS lo,
                   b.v + 1.5 * (b.v - a.v) AS hi
            FROM (SELECT * FROM r WHERE rk = (n * 25 + 99) // 100) a
            JOIN (SELECT * FROM r WHERE rk = (n * 75 + 99) // 100) b
              ON a.event_type = b.event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(f.q1) AS q1, MIN(f.q3) AS q3,
               CAST(SUM(CASE WHEN CAST(e.value AS DOUBLE) < f.lo
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_outliers,
               CAST(SUM(CASE WHEN CAST(e.value AS DOUBLE) > f.hi
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_high_outliers
        FROM events e JOIN f ON f.event_type = e.event_type
        GROUP BY 1
    """,
    "q_join_key_skew": """
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        g AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(n * n) AS BIGINT) AS sum_sq,
                   CAST(MAX(n) AS BIGINT) AS top_key_rows
            FROM c
        )
        SELECT n_rows, n_keys, top_key_rows,
               CAST(n_rows * n_rows - sum_sq AS DOUBLE)
                   / CAST(n_rows * n_rows AS DOUBLE) AS gini_simpson,
               CAST(top_key_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   AS top_share
        FROM g
    """,
    "q_attribution_first_touch": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_idx
            FROM flagged
        ),
        att AS (
            SELECT *,
                   first_value(event_type) OVER (
                       PARTITION BY user_id, session_idx
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS first_touch
            FROM sess
        )
        SELECT first_touch,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                   AS attributed_value
        FROM att WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    "q_rollup_hierarchy": """
        SELECT date_trunc('day', ts) AS day_ts, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_bounce_rate": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_idx
            FROM flagged
        ),
        att AS (
            SELECT *,
                   first_value(event_type) OVER (
                       PARTITION BY user_id, session_idx
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS entry_type
            FROM sess
        ),
        per_session AS (
            SELECT user_id, session_idx,
                   MIN(entry_type) AS entry_type,
                   COUNT(*) AS n_events
            FROM att GROUP BY 1, 2
        )
        SELECT entry_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
        FROM per_session GROUP BY 1
    """,
    "q_weekly_profile": """
        SELECT CAST((epoch_us(ts) // 86400000000) % 7 AS BIGINT)
                   AS epoch_dow,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_user_lifetime": """
        SELECT user_id,
               MIN(ts) AS first_seen,
               MAX(ts) AS last_seen,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE)
                   / CAST(1000000 AS DOUBLE) AS lifetime_sec,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS active_days,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY 1
    """,
    "q_interarrival_stats": """
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   )) AS gap_us
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
               CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_gap_us
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY 1
    """,
    "q_incremental_rollup": """
        SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_hopping_window_agg": """
        WITH assign AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type, value
            FROM events
            UNION ALL
            SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start,
                   event_type, value
            FROM events
        )
        SELECT window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM assign GROUP BY 1, 2
    """,
    "q_exact_median_twopass": f"""
        WITH r AS (
            SELECT event_type, CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY CAST(value AS DOUBLE)) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM events
        )
        SELECT event_type,
               CAST(50 AS BIGINT) AS percentile,
               n AS n_rows,
               LEAST({_HIST_BINS - 1}, GREATEST(0,
                   CAST(floor((v - {_HIST_LO}) * {float(_HIST_BINS)}
                              / {_HIST_HI - _HIST_LO}) AS BIGINT)))
                   AS bucket,
               CAST((n * 50 + 99) // 100 AS BIGINT) AS rank,
               v AS exact_value
        FROM r WHERE rk = (n * 50 + 99) // 100
    """,
    "q_hist_quantile_sketch": f"""
        WITH b AS (
            SELECT event_type,
                   LEAST({_HIST_BINS - 1}, GREATEST(0,
                       CAST(floor((CAST(value AS DOUBLE) - {_HIST_LO})
                                  * {float(_HIST_BINS)} / {_HIST_HI - _HIST_LO})
                            AS BIGINT))) AS bucket
            FROM events
        ),
        h AS (
            SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM b GROUP BY 1, 2
        ),
        c AS (
            SELECT event_type, bucket, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type
                                       ORDER BY bucket) AS BIGINT) AS cum,
                   CAST(COALESCE(SUM(cnt) OVER (
                       PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n_rows
            FROM h
        ),
        p AS (SELECT unnest([{", ".join(str(p) for p in _HIST_PCTS)}])
                  AS pct)
        SELECT c.event_type,
               CAST(p.pct AS BIGINT) AS percentile,
               c.n_rows, c.bucket,
               CAST((c.n_rows * p.pct + 99) // 100 AS BIGINT) AS rank,
               c.cum_before,
               CAST({_HIST_LO} AS DOUBLE)
                   + (CAST(c.bucket AS DOUBLE)
                      + CAST((c.n_rows * p.pct + 99) // 100 - c.cum_before
                             AS DOUBLE) / CAST(c.cnt AS DOUBLE))
                   * CAST({(_HIST_HI - _HIST_LO) / _HIST_BINS!r} AS DOUBLE)
                   AS estimate
        FROM c CROSS JOIN p
        WHERE c.cum >= (c.n_rows * p.pct + 99) // 100
          AND c.cum_before < (c.n_rows * p.pct + 99) // 100
    """,
    "q_hll_intersection": (lambda m, rmax, a_num, a_den: (
        lambda regs, est: f"""
        WITH ha AS ({regs("event_type = 'click'")}),
        hb AS ({regs("event_type = 'purchase'")}),
        hu AS (
            SELECT idx, MAX(rho) AS rho
            FROM (SELECT * FROM ha UNION ALL SELECT * FROM hb)
            GROUP BY 1
        ),
        ea AS ({est('ha', 'est_click')}),
        eb AS ({est('hb', 'est_purchase')}),
        eu AS ({est('hu', 'est_union')}),
        ex AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
            FROM (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'click') a
            JOIN (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase') b
              ON a.user_id = b.user_id
        )
        SELECT ea.est_click, eb.est_purchase, eu.est_union,
               ea.est_click + eb.est_purchase - eu.est_union
                   AS est_intersection,
               ex.exact_intersection
        FROM ea, eb, eu, ex
    """)(
        lambda where: f"""
            SELECT idx, MAX(CASE WHEN word = 0 THEN {rmax}
                                 ELSE {rmax} - length(bin(word)) END) AS rho
            FROM (
                SELECT ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)),
                            1, 4))::BIGINT % {m} AS idx,
                       ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)),
                            5, 12))::BIGINT AS word
                FROM events WHERE {where}
            ) GROUP BY 1
        """,
        lambda rel, alias: f"""
            SELECT CAST({a_num * m * m} AS DOUBLE)
                       * CAST({1 << (rmax + 1)} AS DOUBLE)
                       / CAST({a_den} AS DOUBLE)
                       / CAST(zsum AS DOUBLE) AS {alias}
            FROM (
                SELECT CAST(SUM(1::BIGINT << CAST({rmax + 1} - rho AS INT))
                            + ({m} - COUNT(*))
                              * (1::BIGINT << {rmax + 1}) AS BIGINT) AS zsum
                FROM {rel}
            )
        """,
    ))(
        1 << _HLL_P,
        _sk._HLL_RHO_MAX,
        *_sk._hll_alpha_num_den(1 << _HLL_P),
    ),
    "q_hll_distinct_users": (lambda m, rmax, a_num, a_den: f"""
        WITH h AS (
            SELECT event_type,
                   ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)),
                        1, 4))::BIGINT % {m} AS idx,
                   ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)),
                        5, 12))::BIGINT AS word
            FROM events
        ),
        regs AS (
            SELECT event_type, idx,
                   MAX(CASE WHEN word = 0 THEN {rmax}
                            ELSE {rmax} - length(bin(word)) END) AS rho
            FROM h GROUP BY 1, 2
        ),
        agg AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS regs_hit,
                   CAST(SUM(1::BIGINT << CAST({rmax + 1} - rho AS INT))
                        AS BIGINT) AS zsum_hit
            FROM regs GROUP BY 1
        ),
        z AS (
            SELECT event_type, regs_hit,
                   CAST({m} - regs_hit AS BIGINT) AS zero_regs,
                   CAST(zsum_hit + ({m} - regs_hit)
                        * (1::BIGINT << {rmax + 1}) AS BIGINT) AS zsum
            FROM agg
        ),
        ex AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM events GROUP BY 1
        )
        SELECT z.event_type, z.regs_hit, z.zero_regs, z.zsum,
               CAST({a_num * m * m} AS DOUBLE)
                   * CAST({1 << (rmax + 1)} AS DOUBLE)
                   / CAST({a_den} AS DOUBLE)
                   / CAST(z.zsum AS DOUBLE) AS hll_est,
               CAST({5 * m} AS DOUBLE) / CAST(2 AS DOUBLE) >=
                   (CAST({a_num * m * m} AS DOUBLE)
                    * CAST({1 << (rmax + 1)} AS DOUBLE)
                    / CAST({a_den} AS DOUBLE)
                    / CAST(z.zsum AS DOUBLE)) AS lc_regime,
               ex.exact_users
        FROM z JOIN ex ON z.event_type = ex.event_type
    """)(
        1 << _HLL_P,
        _sk._HLL_RHO_MAX,
        *_sk._hll_alpha_num_den(1 << _HLL_P),
    ),
    "q_cooccurrence_lift": """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
               FROM ut),
        s AS (
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
            FROM ut GROUP BY 1
        ),
        p AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                              AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, p.n_both,
               sa.n AS n_a, sb.n AS n_b, nu.n_users,
               CAST(p.n_both AS DOUBLE) * CAST(nu.n_users AS DOUBLE)
                   / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
        FROM p
        JOIN s sa ON sa.event_type = p.type_a
        JOIN s sb ON sb.event_type = p.type_b
        CROSS JOIN nu
    """,
    "q_series_correlation": """
        WITH agg AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg),
        spine AS (
            SELECT t.event_type, s.bucket_ts
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
                    AS bucket_ts
                FROM bounds
            ) s
        ),
        f AS (
            SELECT spine.event_type, spine.bucket_ts,
                   COALESCE(agg.x, 0) AS x
            FROM spine LEFT JOIN agg USING (event_type, bucket_ts)
        ),
        p AS (
            SELECT a.event_type AS cat_a, b.event_type AS cat_b,
                   a.x AS xa, b.x AS xb
            FROM f a JOIN f b ON a.bucket_ts = b.bucket_ts
                             AND a.event_type < b.event_type
        ),
        s AS (
            SELECT cat_a, cat_b,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                   CAST(SUM(xa) AS BIGINT) AS sx,
                   CAST(SUM(xb) AS BIGINT) AS sy,
                   CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                   CAST(SUM(xb * xb) AS BIGINT) AS syy
            FROM p GROUP BY 1, 2
        )
        SELECT cat_a, cat_b, n_buckets, sxy, sx, sy, sxx, syy,
               CASE WHEN (n_buckets * sxx - sx * sx) > 0
                     AND (n_buckets * syy - sy * sy) > 0
                    THEN CAST(n_buckets * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(n_buckets * sxx - sx * sx AS DOUBLE)
                                * CAST(n_buckets * syy - sy * sy AS DOUBLE))
                    ELSE CAST(0 AS DOUBLE) END AS pearson_r
        FROM s
    """,
    "q_json_payload_stats": """
        WITH x AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unparsed,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MIN(k) AS BIGINT) AS min_k,
               CAST(MAX(k) AS BIGINT) AS max_k,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k
        FROM x GROUP BY 1
    """,
    "q_markov_transitions": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_state,
                   event_type AS next_state
            FROM events
        ),
        c AS (
            SELECT prev_state, next_state,
                   CAST(COUNT(*) AS BIGINT) AS n_transitions
            FROM pairs WHERE prev_state IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_state, next_state, n_transitions,
               CAST(SUM(n_transitions) OVER (PARTITION BY prev_state)
                    AS BIGINT) AS n_from_prev,
               CAST(n_transitions AS DOUBLE)
                   / CAST(SUM(n_transitions) OVER (PARTITION BY prev_state)
                          AS DOUBLE) AS p_transition
        FROM c
    """,
    "q_join_size_sketch": f"""
        WITH dd AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d),
        a AS (
            SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt_a
            FROM (
                SELECT dd.d,
                       ('0x' || substr(md5('js' || CAST(dd.d AS VARCHAR)
                            || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                           % {_CMS_W} AS bucket
                FROM events, dd
            ) GROUP BY 1, 2
        ),
        b AS (
            SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt_b
            FROM (
                SELECT dd.d,
                       ('0x' || substr(md5('js' || CAST(dd.d AS VARCHAR)
                            || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                           % {_CMS_W} AS bucket
                FROM orders, dd
            ) GROUP BY 1, 2
        ),
        ip AS (
            SELECT a.d, CAST(SUM(a.cnt_a * b.cnt_b) AS BIGINT) AS ip
            FROM a JOIN b ON a.d = b.d AND a.bucket = b.bucket
            GROUP BY 1
        ),
        est AS (SELECT CAST(MIN(ip) AS BIGINT) AS join_size_est FROM ip),
        ex AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_size
            FROM events e JOIN orders o ON e.user_id = o.o_custkey
        )
        SELECT ex.exact_join_size, est.join_size_est,
               est.join_size_est >= ex.exact_join_size
                   AS never_underestimates
        FROM est, ex
    """,
    "q_cms_heavy_hitters": f"""
        WITH dd AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d),
        b AS (
            SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT dd.d,
                       ('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR)
                            || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                           % {_CMS_W} AS bucket
                FROM events, dd
            ) GROUP BY 1, 2
        ),
        t AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id ASC) AS rk
            FROM events GROUP BY 1
        ),
        topk AS (SELECT user_id, true_n FROM t WHERE rk <= 10),
        probe AS (
            SELECT p.user_id, MIN(COALESCE(b.cnt, 0)) AS cms_est
            FROM (
                SELECT topk.user_id, dd.d,
                       ('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR)
                            || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                           % {_CMS_W} AS bucket
                FROM topk, dd
            ) p
            LEFT JOIN b ON b.d = p.d AND b.bucket = p.bucket
            GROUP BY 1
        )
        SELECT topk.user_id, topk.true_n,
               CAST(probe.cms_est AS BIGINT) AS cms_est,
               probe.cms_est >= topk.true_n AS never_underestimates
        FROM topk JOIN probe ON topk.user_id = probe.user_id
    """,
    # Sketch contract checks: the exact columns are real oracle
    # computations; the booleans assert the Spark-computed accuracy
    # contract held (a sketch regression flips them to FALSE → hash
    # mismatch). Sketch numerics are engine-specific and live in pytest.
    "q_approx_distinct_users": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS approx_within_5pct
        FROM events GROUP BY 1
    """,
    "q_approx_percentile_value": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS median_in_p40_p60,
               TRUE AS p90_in_p85_p95
        FROM events GROUP BY 1
    """,
    "q_hll_mergeable_distinct": """
        SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total_users,
               TRUE AS merged_within_5pct
        FROM events
    """,
    "q_sessionize_gap_batch": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx,
               min(ts) AS session_start,
               max(ts) AS session_end,
               COUNT(*) AS n_events,
               (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000 AS duration_sec
        FROM sess
        GROUP BY 1, 2
    """,
    "q_session_window_agg": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_idx
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, session_idx
    """,
    "q_moving_avg_time_range": """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sum_30s,
               COUNT(*) OVER w AS n_30s,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
                   / (COUNT(*) OVER w) AS avg_30s
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts
            RANGE BETWEEN INTERVAL 30 SECOND PRECEDING AND CURRENT ROW
        )
    """,
    "q_value_outliers": """
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1
        ),
        dev AS (
            SELECT e.event_id, e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY 1
        )
        SELECT d.event_id, d.event_type, d.value, d.med, m.mad
        FROM dev d JOIN mad m USING (event_type)
        WHERE d.adev > 3 * m.mad
    """,
    "q_upsert_latest": """
        SELECT user_id, ts, event_id, event_type, value FROM (
            SELECT user_id, ts, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "q_value_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS median_value,
               quantile_cont(value, 0.9) AS p90_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1
    """,
    "q_asof_purchase_attribution": """
        SELECT a.event_id, a.user_id, a.ts,
               b.ts AS purchase_ts,
               b.event_id AS purchase_event_id,
               b.value AS purchase_value
        FROM events a
        LEFT JOIN LATERAL (
            SELECT p.ts, p.event_id, p.value
            FROM events p
            WHERE p.user_id = a.user_id
              AND p.event_type = 'purchase'
              AND p.ts <= a.ts
            ORDER BY p.ts DESC, p.event_id DESC
            LIMIT 1
        ) b ON TRUE
        WHERE a.event_type = 'click'
    """,
    "q_interval_error_click_window": """
        SELECT e.event_id AS error_id,
               e.user_id,
               e.ts AS start_ts,
               CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks
        FROM events e
        LEFT JOIN events c
          ON c.user_id = e.user_id
         AND c.event_type = 'click'
         AND c.ts >= e.ts
         AND c.ts <= e.ts + INTERVAL 120 SECOND
        WHERE e.event_type = 'error'
        GROUP BY 1, 2, 3
    """,
    "q_cdc_snapshot": """
        WITH log AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'signup' THEN 'I'
                        WHEN event_type = 'error' THEN 'D'
                        ELSE 'U' END AS op,
                   value
            FROM events
        ),
        ranked AS (
            SELECT user_id, ts, event_id, op, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rk
            FROM log
        ),
        audit AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_ops,
                   CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_inserts,
                   CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_deletes
            FROM log GROUP BY 1
        )
        SELECT r.user_id, r.ts, r.event_id, r.op AS last_op, r.value,
               a.n_ops, a.n_inserts,
               CAST(a.n_ops - a.n_inserts - a.n_deletes AS BIGINT)
                   AS n_updates,
               a.n_deletes
        FROM ranked r JOIN audit a ON a.user_id = r.user_id
        WHERE r.rk = 1 AND r.op <> 'D'
    """,
    "q_hourly_autocorrelation": """
        WITH agg AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg),
        spine AS (
            SELECT t.event_type, s.bucket_ts
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
                    AS bucket_ts
                FROM bounds
            ) s
        ),
        f AS (
            SELECT spine.event_type, spine.bucket_ts,
                   COALESCE(agg.x, 0) AS x
            FROM spine LEFT JOIN agg USING (event_type, bucket_ts)
        ),
        p AS (
            SELECT event_type, x,
                   lead(x) OVER (PARTITION BY event_type
                                 ORDER BY bucket_ts) AS y
            FROM f
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM p WHERE y IS NOT NULL GROUP BY 1
        )
        SELECT event_type, n_pairs, sxy, sx, sy, sxx, syy,
               CASE WHEN (n_pairs * sxx - sx * sx) > 0
                     AND (n_pairs * syy - sy * sy) > 0
                    THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                                * CAST(n_pairs * syy - sy * sy AS DOUBLE))
                    ELSE CAST(0 AS DOUBLE) END AS acf1,
               CASE WHEN sx > 0
                    THEN CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                         / CAST(n_pairs * sx AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS fano
        FROM s
    """,
    "q_rollup_gapfill_hourly": """
        WITH agg AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_ts,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2
        ),
        bounds AS (SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg),
        spine AS (
            SELECT t.event_type, s.bucket_ts
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts
                FROM bounds
            ) s
        )
        SELECT spine.event_type,
               spine.bucket_ts,
               COALESCE(agg.n_events, 0) AS n_events,
               last_value(agg.sum_value IGNORE NULLS) OVER (
                   PARTITION BY spine.event_type
                   ORDER BY spine.bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sum_value
        FROM spine
        LEFT JOIN agg USING (event_type, bucket_ts)
    """,
}


_EWMA_LAGS = 8  # current bucket + 7 trailing hours; weight 2^(7-gap)
_AB_MIN_PURCHASES = 14  # conversion = at least this many purchase events


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-aware exponential smoothing of each user's hourly event-count
    series — the classic EWMA with α = 1/2, but with EXACT integer
    weights: a bucket `gap` hours behind the current one contributes its
    count shifted by ``1 << (7 - gap)``, so the smoothed value is one
    IEEE division of two exact integers (libm-free; a pow()-based decay
    would not replay cross-engine). Missing hours contribute nothing to
    numerator OR denominator, so the estimate renormalizes over the
    buckets that exist (gap-aware, not row-lag-based — a 5-hour silence
    decays the old evidence, which `lag()` over observed rows would not).

    Scale shape: counts collapse to (user, hour) in one map-side-combined
    shuffle, then ONE per-user window computes all ≤7 trailing
    contributions via hour-gap-gated lag() columns — bucket rows shuffle
    exactly once (the first formulation exploded each bucket ×8 into a
    second keyed aggregate; the shuffle-bytes audit measured it at 4.8
    shuffle bytes per input byte vs ~0.6 for this shape). lag(k) is
    row-based but the gap GATE makes it hour-based: a trailing row more
    than 7 hours back contributes nothing, whatever its row distance.
    Per-user partitions — never a global window."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = _EWMA_LAGS - 1
    win = "(PARTITION BY user_id ORDER BY h)"

    def _terms(value: str) -> str:
        parts = [f"c * shiftleft(1L, {top})" if value == "c" else f"shiftleft(1L, {top})"]
        for k in range(1, _EWMA_LAGS):
            gap = f"(h - lag(h, {k}) OVER {win})"
            wgt = f"shiftleft(1L, {top} - {gap})"
            contrib = (
                f"lag(c, {k}) OVER {win} * {wgt}" if value == "c" else wgt
            )
            parts.append(
                f"CASE WHEN {gap} < {_EWMA_LAGS} THEN {contrib} ELSE 0 END"
            )
        return " + ".join(parts)

    return buckets.selectExpr(
        "user_id",
        "h AS hour_idx",
        "c AS n_events",
        f"CAST({_terms('c')} AS BIGINT) AS num",
        f"CAST({_terms('1')} AS BIGINT) AS den",
    ).withColumn(
        "ewma",
        F.col("num").cast("double") / F.col("den").cast("double"),
    )


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly audit: each concrete (day, hour) traffic
    bucket is compared against the mean of ALL buckets sharing its
    (epoch-day-of-week, hour-of-day) cell — "is this Tuesday 3pm unusual
    for a Tuesday 3pm". Flags are integer cross-multiplications
    (n·n_cell vs 2·sum_cell and 2·n·n_cell vs sum_cell — no float
    boundary decides membership); the reported cell mean is one IEEE
    division. Two keyed aggregates; the cell table re-aggregates the
    bucket table (calendar-cell-sized, 7×24 keys at most)."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day_idx"),
        F.expr("(unix_micros(ts) div 3600000000) % 24")
        .cast("long")
        .alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = buckets.groupBy(
        (F.col("day_idx") % 7).alias("dow"), "hod"
    ).agg(
        F.sum("n").cast("long").alias("sum_cell"),
        F.count(F.lit(1)).cast("long").alias("n_cell"),
    )
    return (
        buckets.withColumn("dow", F.col("day_idx") % 7)
        .join(F.broadcast(cells), ["dow", "hod"])
        .select(
            "day_idx",
            "dow",
            "hod",
            "n",
            (F.col("sum_cell").cast("double") / F.col("n_cell").cast("double")).alias(
                "cell_mean"
            ),
            (F.col("n") * F.col("n_cell") > 2 * F.col("sum_cell"))
            .alias("flag_high"),
            (2 * F.col("n") * F.col("n_cell") < F.col("sum_cell"))
            .alias("flag_low"),
        )
    )


def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-score on a user-level conversion metric
    (heavy purchaser: ≥ `_AB_MIN_PURCHASES` purchase events — "any
    purchase" saturates at p = 1 on the fixture, which degenerates the
    pooled variance to 0), with deterministic md5-parity arm assignment
    (the hash-gate discipline — both engines derive the identical split,
    no RNG). Counts are exact integers; the z statistic is the textbook
    pooled formula evaluated in a FIXED operation order (each /, ·, sqrt
    is a single correctly-rounded IEEE op, so the float replays
    bit-exactly cross-engine); a degenerate pooled variance (p̄ ∈ {0,1})
    yields NULL rather than a 0/0. One user aggregate + one 2-row arm
    aggregate + a 1-row pivot."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= _AB_MIN_PURCHASES
        )
        .cast("long")
        .alias("converted")
    )
    arms = users.groupBy(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    wide = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_users")).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_conv")).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_users")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_conv")).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        (pp * (F.lit(1.0) - pp))
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        p0.alias("p0"),
        p1.alias("p1"),
        F.when(se > 0.0, (p0 - p1) / se).alias("zscore"),
    )


ORACLES["q_ewma_smooth"] = f"""
    WITH buckets AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    contrib AS (
        SELECT user_id, h + gap AS th,
               c * (1 << ({_EWMA_LAGS - 1} - gap)) AS wc,
               (1 << ({_EWMA_LAGS - 1} - gap)) AS w
        FROM buckets, (SELECT unnest(range(0, {_EWMA_LAGS})) AS gap)
    ),
    sums AS (
        SELECT user_id, th,
               CAST(SUM(wc) AS BIGINT) AS num,
               CAST(SUM(w) AS BIGINT) AS den
        FROM contrib GROUP BY 1, 2
    )
    SELECT b.user_id, b.h AS hour_idx, b.c AS n_events, s.num, s.den,
           CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE) AS ewma
    FROM buckets b
    JOIN sums s ON b.user_id = s.user_id AND b.h = s.th
"""

ORACLES["q_seasonal_anomaly"] = """
    WITH buckets AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
               CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    cells AS (
        SELECT day_idx % 7 AS dow, hod,
               CAST(SUM(n) AS BIGINT) AS sum_cell,
               CAST(COUNT(*) AS BIGINT) AS n_cell
        FROM buckets GROUP BY 1, 2
    )
    SELECT b.day_idx, b.day_idx % 7 AS dow, b.hod, b.n,
           CAST(c.sum_cell AS DOUBLE) / CAST(c.n_cell AS DOUBLE)
               AS cell_mean,
           b.n * c.n_cell > 2 * c.sum_cell AS flag_high,
           2 * b.n * c.n_cell < c.sum_cell AS flag_low
    FROM buckets b
    JOIN cells c ON b.day_idx % 7 = c.dow AND b.hod = c.hod
"""

ORACLES["q_ab_test_zscore"] = f"""
    WITH users AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        >= {_AB_MIN_PURCHASES} AS BIGINT) AS converted
        FROM events GROUP BY 1
    ),
    arms AS (
        SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                    % 2) AS arm,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_conv
        FROM users GROUP BY 1
    ),
    wide AS (
        SELECT
            CAST(SUM(CASE WHEN arm = 0 THEN n_users ELSE 0 END) AS BIGINT)
                AS n0,
            CAST(SUM(CASE WHEN arm = 0 THEN n_conv ELSE 0 END) AS BIGINT)
                AS c0,
            CAST(SUM(CASE WHEN arm = 1 THEN n_users ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(SUM(CASE WHEN arm = 1 THEN n_conv ELSE 0 END) AS BIGINT)
                AS c1
        FROM arms
    )
    SELECT n0, c0, n1, c1,
           CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
           CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
           CASE WHEN sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                   * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)))
                  * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) > 0.0
           THEN
           (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
            - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                   * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)))
                  * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
           END AS zscore
    FROM wide
"""


_TAIL_PCTS = (50, 95, 99)


def q_type_duration_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-latency profile per event type — exact p50/p95/p99 of
    `value` via the two-pass histogram refinement (`exact_quantile_
    twopass`), the trace-analysis artifact the reference's output schema
    exists to serve (per-event-type duration percentiles; XELoader
    bulk-loads XEvent traces precisely so DBAs can run this query, cf.
    XELoader/README.md). A sort-based `percentile()` buffers every group
    value in memory; the two-pass shape keeps state sketch-sized in pass
    1 and ranks only the rank-carrying bucket (~N/bins rows) in pass 2.
    One operator call per percentile, unioned — each is independently
    the proven plan shape; k-th-smallest-VALUE semantics keep duplicates
    engine-independent."""
    from ..operators import sketch as sk

    ev = load_table(spark, sf_dir, "events")
    out = None
    for p in _TAIL_PCTS:
        part = sk.exact_quantile_twopass(
            ev, "value", p, _HIST_LO, _HIST_HI, _HIST_BINS, ["event_type"]
        )
        out = part if out is None else out.unionByName(part)
    return out


def _tail_pct_sql() -> str:
    parts = []
    for p in _TAIL_PCTS:
        parts.append(f"""
        SELECT event_type,
               CAST({p} AS BIGINT) AS percentile,
               n AS n_rows,
               LEAST({_HIST_BINS - 1}, GREATEST(0,
                   CAST(floor((v - {_HIST_LO}) * {_HIST_BINS}.0
                              / ({_HIST_HI} - {_HIST_LO})) AS BIGINT)))
                   AS bucket,
               CAST((n * {p} + 99) // 100 AS BIGINT) AS rank,
               v AS exact_value
        FROM r WHERE rk = (n * {p} + 99) // 100
        """)
    return f"""
        WITH r AS (
            SELECT event_type, CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY CAST(value AS DOUBLE)) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM events
        )
        {" UNION ALL ".join(parts)}
    """


ORACLES["q_type_duration_percentiles"] = _tail_pct_sql()
