"""Temporal operators: as-of join, point-in-interval join, gap-filled rollup.

The reference emits three time columns per event row expressly so the
downstream store can run time-sequencing and graphing queries
(XELoader/InputParameters.cs:622-626, README.md:29). These operators are
that downstream time-series surface, built Spark-first rather than as
row-at-a-time logic:

- ``asof_join``: the distributed merge-join formulation — tag both sides,
  union, ONE shuffle on the key, sort within partition, and a
  ``last(..., ignorenulls=True)`` running window picks the match. Cost is
  a single hash partition + sort regardless of time-range width; there is
  no range explosion and no per-row subquery. This is the shape that
  survives 100 TB: skew on the key is the only hazard (salt upstream if a
  key holds a large fraction of rows).
- ``interval_join``: turns the inequality join ``start <= ts <= end``
  (a nested-loop / O(|points|·|intervals|) plan in naive form) into an
  equi-join on a time bucket: intervals explode into the buckets they
  overlap (``len/bucket + 1`` rows each), points map to exactly one
  bucket, and an exact refine filter runs on the equi-matches only. Since
  each point has exactly one bucket, a (point, interval) pair can match
  at most once — no dedup pass is needed.
- ``rollup_gapfill``: bucketed aggregate (map-side partial agg shuffles
  only #keys × #buckets rows) joined onto a generated dense time spine,
  with zero-fill and LOCF (last-observation-carried-forward) fills. The
  spine is derived data (#keys × #buckets rows), never a driver-side
  loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "rollup_gapfill", "funnel"]


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tie_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``backward``) or at-or-after (``forward``) its timestamp, per key.

    Matched right columns are appended; names colliding with left columns
    (and the matched timestamp, always) get ``suffix``. Rows with no match
    (or none within ``tolerance_seconds``) keep nulls.

    Ties on the right timestamp are broken by ``tie_col`` (defaults to the
    first right payload column): backward takes the greatest, forward the
    smallest — matching the oracle formulation
    ``ORDER BY ts DESC, tie DESC LIMIT 1`` / ``ORDER BY ts ASC, tie ASC``.

    Plan shape: union of the two scans → single Exchange on the key →
    sort-within-partition → running ``last`` — the merge-join formulation.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _keys(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_cols = list(right_cols)
    if tie_col is None:
        tie_col = right_cols[0] if right_cols else right_ts

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.col(tie_col).alias("__tie"),
        payload.alias("__payload"),
        F.lit(0).alias("__side"),
    )
    lf = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    unioned = lf.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tie").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        delta = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
        if direction == "forward":
            delta = -delta
        matched = matched.withColumn(
            "__m", F.when(delta <= tol_us, F.col("__m"))
        )

    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}"))
    for c in right_cols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(F.col(f"__m.{c}").alias(name))
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 60,
) -> DataFrame:
    """Inner-join points into ``[start, end]`` intervals (inclusive both
    ends) sharing the key — as an equi-join on a time bucket plus an exact
    refine, never a nested loop.

    ``bucket_seconds`` trades interval fan-out (each interval becomes
    ``len/bucket + 1`` rows) against match selectivity; pick it near the
    typical interval length. Column name collisions between the two inputs
    must be resolved by the caller (select/alias before the call).
    """
    keys = _keys(on)
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"alias away overlapping non-key columns before the join: {sorted(overlap)}"
        )
    bs_us = bucket_seconds * 1_000_000
    p = points.withColumn("__bk", F.expr(f"unix_micros({point_ts}) div {bs_us}"))
    iv = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start_col}) div {bs_us}"),
                    F.expr(f"unix_micros({end_col}) div {bs_us}"),
                )
            ),
        )
    )
    return (
        p.join(iv, [*keys, "__bk"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bk")
    )


def rollup_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] = (),
    zero_cols: Sequence[str] = (),
    locf_cols: Sequence[str] = (),
) -> DataFrame:
    """Time-bucketed aggregate with a dense gap-filled spine per key
    ("hypertable rollup"): every (key, bucket) between the globally first
    and last observed bucket appears exactly once.

    ``aggs`` are pre-aliased aggregate Columns. ``zero_cols`` fill missing
    buckets with 0 (type-preserving); ``locf_cols`` carry the last
    observed value forward per key (leading gaps stay null).

    Output column ``bucket_ts`` is the bucket start. The spine is
    #distinct-keys × #buckets rows — derived with ``sequence``/``explode``
    on executors, no driver-side loop.
    """
    keys = list(keys)
    bs_us = bucket_seconds * 1_000_000
    bucket = F.expr(
        f"timestamp_seconds((unix_micros({ts_col}) div {bs_us}) * {bucket_seconds})"
    ).alias("bucket_ts")
    agg = df.groupBy(*keys, bucket).agg(*aggs)

    bounds = agg.agg(
        F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx")
    )
    spine_ts = bounds.select(
        F.explode(
            F.sequence(
                F.col("__mn"),
                F.col("__mx"),
                F.expr(f"INTERVAL {bucket_seconds} SECONDS"),
            )
        ).alias("bucket_ts")
    )
    spine = df.select(*keys).distinct().crossJoin(F.broadcast(spine_ts))

    filled = spine.join(agg, [*keys, "bucket_ts"], "left")
    agg_schema = {f.name: f.dataType for f in agg.schema.fields}
    for c in zero_cols:
        filled = filled.withColumn(
            c, F.coalesce(F.col(c), F.lit(0).cast(agg_schema[c]))
        )
    if locf_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in locf_cols:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered-sequence (funnel) analysis: per user, the first time each
    step was reached *strictly after* the previous step — step k counts
    only if it happens after the user's first qualifying step k-1.

    Formulation: one window pass per step over the SAME window spec
    (partition by user, order by (ts, tiebreak), running frame), so
    Catalyst plans a single Exchange on user and sorts once; step k's
    running ``min(CASE step-k row AND ts > t_{k-1})`` reads the previous
    layer's running value on the same row. The per-user reduction is then
    a plain MIN per step (min of a running min is the overall min). No
    self-joins, no per-step scans of the corpus — cost is one shuffle on
    user regardless of funnel depth.

    Output: (user, t_1 … t_k) — t_i null where the user never reached
    step i in order. Strict ``>`` comparisons make same-timestamp steps
    not count as progression, so result values are independent of the
    tie-break ordering (which exists only to total-order the sort).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(user_col, ts_col, type_col, tiebreak_col)
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(
            f"t_{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"t_{i}"
    return out.groupBy(F.col(user_col).alias("user")).agg(
        *[F.min(f"t_{i}").alias(f"t_{i}") for i in range(1, len(steps) + 1)]
    )


def retention_cohorts(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Classic cohort-retention matrix: users bucketed by first-seen day
    (their cohort), counted on every later active-day offset — the
    (cohort_day, age_days, n_users) triangle a growth dashboard plots.

    Scale shape: TWO shuffles total. The event stream collapses straight
    to one `collect_set(day)` row per user (map-side partial sets, rows
    bounded by the date span — not event volume); cohort is `array_min`
    of that set, so no distinct→min→join-back chain re-shuffles user_id
    twice. The exploded (cohort, age) pairs then feed the days²-sized
    matrix aggregate. cohort_day is emitted as 'yyyy-MM-dd' text so the
    cross-engine value canon is date-library-free."""
    per_user = (
        events.select(
            F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("day")
        )
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    return (
        per_user.select(
            F.array_min("days").alias("cohort"),
            F.explode("days").alias("day"),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("long").alias("age_days"),
        )
        .groupBy("cohort_day", "age_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: compress a mutation
    log into one row per (key, consecutive run of equal attribute
    values) with effective_from / effective_to validity bounds, a dense
    version number, and the run length. The current version has
    effective_to NULL — the standard warehouse dimension-history shape
    (the reference loads raw change events for exactly this kind of
    downstream modeling; here it is a native operator).

    Scale shape: ONE shuffle. Every window partitions by the key —
    change detection orders by (ts, seq) and the change-row windows
    order by the row number derived from that same order, so Catalyst
    reuses one hash partitioning with local sorts only. Run lengths
    come from row-number differences (next change's position minus
    ours), not from a second aggregation pass, so the log is scanned
    once and only change rows survive past the first projection.
    (ts, seq) is a total order per key, making version numbering and
    run attribution deterministic under any partitioning.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    w_all = Window.partitionBy(key_col)
    marked = (
        df.select(key_col, ts_col, attr_col, seq_col)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("prev_attr", F.lag(attr_col).over(w))
        .withColumn("n_total", F.count(F.lit(1)).over(w_all))
    )
    changes = marked.filter(
        ~F.col("prev_attr").eqNullSafe(F.col(attr_col))
    )
    wc = Window.partitionBy(key_col).orderBy("rn")
    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(wc).alias("effective_to"),
        F.row_number().over(wc).cast("long").alias("version"),
        (
            F.coalesce(F.lead("rn").over(wc), F.col("n_total") + 1)
            - F.col("rn")
        ).alias("n_events"),
    )


def lag1_autocorrelation(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Lag-1 autocorrelation of the per-key bucketed event-count series —
    the burstiness/periodicity diagnostic for a stream (near 0: Poisson
    arrivals; positive: bursty/trending; negative: alternating load).

    Built on the gap-filled spine (`rollup_gapfill` with zero-fill), so
    empty buckets count as 0 rather than silently contracting the
    series. The Pearson r over (x_t, x_{t+1}) pairs is computed from
    integer sufficient statistics (n, Σxy, Σx, Σy, Σx², Σy²); the only
    float ops are one multiply, one sqrt, one divide in pinned order —
    IEEE sqrt is correctly rounded, so even the final double is
    bit-identical across engines. Degenerate (constant) series emit 0.

    Scale shape: counts aggregate map-side-combined; the lag pairing is
    one window over the (keys × buckets)-sized spine, not the raw
    events; final stats are key-sized. Integer sums bound: counts ≤
    ~2^31 per bucket keep n·Σx² within bigint — at petascale swap the
    sums to DECIMAL accumulators (same pattern as `_dsum`)."""
    filled = rollup_gapfill(
        df,
        ts_col=ts_col,
        bucket_seconds=bucket_seconds,
        keys=keys,
        aggs=[F.count(F.lit(1)).cast("long").alias("x")],
        zero_cols=["x"],
    )
    w = Window.partitionBy(*keys).orderBy("bucket_ts")
    p = filled.select(
        *keys, F.col("x"), F.lead("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    s = p.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "long"
    )
    va = (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "long"
    )
    vb = (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "long"
    )
    acf1 = F.when(
        (va > 0) & (vb > 0),
        num.cast("double") / F.sqrt(va.cast("double") * vb.cast("double")),
    ).otherwise(F.lit(0.0))
    # Fano factor (index of dispersion) over the x side of the pairs:
    # variance/mean = (n·Σx² − (Σx)²) / (n·Σx) — 1 for Poisson arrivals,
    # >1 bursty, <1 regular; exact integers finished by one division
    fano = F.when(
        F.col("sx") > 0,
        va.cast("double") / (F.col("n_pairs") * F.col("sx")).cast("double"),
    ).otherwise(F.lit(0.0))
    return s.select(
        *keys, "n_pairs", "sxy", "sx", "sy", "sxx", "syy",
        acf1.alias("acf1"),
        fano.alias("fano"),
    )


def cdc_apply(
    ops: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
    insert_op: str = "I",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change-data-capture log (I/U/D rows) to produce the
    current snapshot — the full MERGE the warehouse sink performs,
    extending `q_upsert_latest`'s upsert with delete semantics and a
    per-key op-mix audit.

    Latest-op-wins by (seq_cols) via ONE max-of-struct aggregate (the
    shuffle carries map-side-combined partials — one candidate row per
    key per task, no per-key sort); keys whose final op is a delete are
    dropped AFTER the audit counts are taken, so a consumer can see how
    much of the log was churn. Ties on seq break deterministically by
    (op, payload) struct order — callers with a unique sequence column
    never hit this.

    Scale: state is key-sized, log scans once, snapshot = one shuffle.
    Re-running over an extended log is idempotent for unchanged keys
    (max is monotone) — the property that makes incremental CDC loads
    safe to replay."""
    key_cols = list(key_cols)
    seq_cols = list(seq_cols)
    payload_cols = list(payload_cols)
    m = ops.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                *seq_cols, F.col(op_col).alias("__op"), *payload_cols
            )
        ).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_ops"),
        F.sum((F.col(op_col) == insert_op).cast("long"))
        .cast("long")
        .alias("n_inserts"),
        F.sum((F.col(op_col) == delete_op).cast("long"))
        .cast("long")
        .alias("n_deletes"),
    )
    live = m.filter(F.col("m.__op") != delete_op)
    return live.select(
        *key_cols,
        *[F.col(f"m.{c}").alias(c) for c in seq_cols],
        F.col("m.__op").alias("last_op"),
        *[F.col(f"m.{c}").alias(c) for c in payload_cols],
        "n_ops",
        "n_inserts",
        (F.col("n_ops") - F.col("n_inserts") - F.col("n_deletes"))
        .cast("long")
        .alias("n_updates"),
        "n_deletes",
    )


def distribution_drift(
    df: DataFrame,
    cat_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Categorical-mix drift between the first and second half of the
    observed time range — the monitoring question ("did the event/source
    mix shift?") answered with total-variation distance instead of
    PSI/KL: TVD = ½ Σ |p_i − q_i| needs no log, so it reduces to exact
    integers. Per category the cross-multiplied numerator
    |n_a·N_b − n_b·N_a| is an exact bigint; the per-category share delta
    and the global TVD each finish with ONE IEEE division, so every
    emitted value is engine-exact. (Bigint products bound: N_a·N_b needs
    counts ≤ ~3·10⁹ per half; past that, swap to DECIMAL accumulators.)

    Scale: one 2-scalar min/max aggregate broadcast back (the split
    point), one map-side-combined (cat, half) count, then two 1-row
    aggregates of the category frame broadcast back via cross join
    (grand totals, then the TVD numerator sum — grand-total WINDOWS
    would plan single-partition exchanges) — the corpus shuffles count
    rows only. Categories absent from one half get share 0 there (they
    count fully toward drift), never dropped."""
    bounds = df.agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("mn"),
        F.max(F.unix_micros(F.col(ts_col))).alias("mx"),
    )
    mid = bounds.select(
        F.expr("(mn + mx) div 2").cast("long").alias("mid_us")
    )
    c = (
        df.crossJoin(F.broadcast(mid))
        .groupBy(cat_col)
        .agg(
            F.sum(
                (F.unix_micros(F.col(ts_col)) <= F.col("mid_us")).cast("long")
            )
            .cast("long")
            .alias("n_first"),
            F.sum(
                (F.unix_micros(F.col(ts_col)) > F.col("mid_us")).cast("long")
            )
            .cast("long")
            .alias("n_second"),
        )
    )
    tot = c.agg(
        F.sum("n_first").cast("long").alias("_na"),
        F.sum("n_second").cast("long").alias("_nb"),
    )
    c2 = c.crossJoin(F.broadcast(tot)).withColumn(
        "cross_diff",
        F.abs(
            F.col("n_first") * F.col("_nb") - F.col("n_second") * F.col("_na")
        ).cast("long"),
    )
    tvd = c2.agg(F.sum("cross_diff").cast("long").alias("_cross_sum"))
    return c2.crossJoin(F.broadcast(tvd)).select(
        cat_col,
        "n_first",
        "n_second",
        "cross_diff",
        (
            F.col("cross_diff").cast("double")
            / (F.col("_na") * F.col("_nb")).cast("double")
        ).alias("share_delta"),
        (
            F.col("_cross_sum").cast("double")
            / (F.lit(2).cast("long") * F.col("_na") * F.col("_nb")).cast(
                "double"
            )
        ).alias("tvd_total"),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of per-key state sequences —
    the clickstream/session model behind "what follows a view?".
    Each key's events are ordered by (ts, tie); consecutive (prev → next)
    state pairs are counted and normalized per source state. Counts are
    integers; the transition probability is ONE IEEE division, so the
    whole matrix is engine-exact.

    Scale: the lag pairing is one window shuffle on the key (the same
    partitioning every sessionization query uses); the matrix aggregate
    is states²-sized with map-side combine; row totals come from a
    states-sized window, not a second scan."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    pairs = (
        df.select(
            key_col,
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .filter(F.col("prev_state").isNotNull())
    )
    c = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    tot = Window.partitionBy("prev_state")
    return c.select(
        "prev_state",
        "next_state",
        "n_transitions",
        F.sum("n_transitions").over(tot).cast("long").alias("n_from_prev"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot).cast("double")
        ).alias("p_transition"),
    )


def series_correlation(
    df: DataFrame,
    cat_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Pairwise Pearson correlation between every two categories'
    gap-filled bucketed count series — "do errors spike when purchases
    spike?". Same integer-sufficient-statistics discipline as
    `lag1_autocorrelation`: the series align on the shared dense spine
    (zeros included), stats are exact bigints, r is one
    multiply/sqrt/divide in pinned order. Degenerate (constant) series
    emit 0 against everything.

    Scale: the spine self-join keys on bucket_ts — (cats × buckets)
    rows joined to itself, never raw events; output is cats²-sized."""
    filled = rollup_gapfill(
        df,
        ts_col=ts_col,
        bucket_seconds=bucket_seconds,
        keys=(cat_col,),
        aggs=[F.count(F.lit(1)).cast("long").alias("x")],
        zero_cols=["x"],
    )
    a = filled.select(
        F.col(cat_col).alias("cat_a"), "bucket_ts", F.col("x").alias("xa")
    )
    b = filled.select(
        F.col(cat_col).alias("cat_b"), "bucket_ts", F.col("x").alias("xb")
    )
    p = a.join(b, "bucket_ts").filter(F.col("cat_a") < F.col("cat_b"))
    s = p.groupBy("cat_a", "cat_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
        F.sum("xa").cast("long").alias("sx"),
        F.sum("xb").cast("long").alias("sy"),
        F.sum(F.col("xa") * F.col("xa")).cast("long").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("long").alias("syy"),
    )
    va = (F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("long")
    vb = (F.col("n_buckets") * F.col("syy") - F.col("sy") * F.col("sy")).cast("long")
    num = (F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    r = F.when(
        (va > 0) & (vb > 0),
        num.cast("double") / F.sqrt(va.cast("double") * vb.cast("double")),
    ).otherwise(F.lit(0.0))
    return s.select(
        "cat_a", "cat_b", "n_buckets", "sxy", "sx", "sy", "sxx", "syy",
        r.alias("pearson_r"),
    )
