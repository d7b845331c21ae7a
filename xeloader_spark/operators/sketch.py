"""Count-min sketch as a RELATIONAL, mergeable frequency table.

Spark ships `count_min_sketch` as an opaque binary aggregate, but SQL
cannot probe it. This formulation keeps the sketch AS A TABLE of
(depth, bucket, cnt) rows — the classic Cormode/Muthukrishnan structure
(public algorithm) where est(x) = min over d of cnt[d][h_d(x)]:

- **Mergeable**: two sketch tables merge by `union` + `SUM` re-aggregate —
  the property that lets 1000 executors (or 1000 daily partials) combine
  frequency state without re-scanning raw data. Sketch size is
  depth × width rows, independent of corpus size.
- **Engine-exact**: bucket hashes are the same md5-prefix arithmetic as
  `sampling.hash_bucket`, so a DuckDB oracle replays the ENTIRE sketch —
  build, merge, probe — value-for-value (no tolerance contract needed,
  unlike the opaque-binary sketches).
- **Never underestimates**: est(x) >= true(x) always; overestimation
  shrinks as width grows (eps = e/width of total mass).

Scale shape: build is one map-side-combined groupBy over (depth, bucket)
keys — input rows fan out ×depth map-side but only depth×width aggregate
rows shuffle. Probes broadcast-join the tiny sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def _bucket_structs(key_col: str, width: int, depth: int, salt: str):
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                hash_bucket(key_col, f"{salt}{d}", width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch table (d, bucket, cnt) — one groupBy shuffle of
    at most depth × width rows after map-side partial aggregation."""
    return (
        df.select(F.explode(_bucket_structs(key_col, width, depth, salt)).alias("s"))
        .select("s.d", "s.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch tables built with identical (width, depth, salt):
    union + SUM — the distributed-combine step."""
    it = iter(sketches)
    merged = next(it)
    for s in it:
        merged = merged.unionByName(s)
    return merged.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Probe: est(key) = min over d of cnt[d][h_d(key)]. The sketch is
    depth × width rows → broadcast; missing buckets count 0."""
    probes = keys_df.select(
        F.col(key_col),
        F.explode(_bucket_structs(key_col, width, depth, salt)).alias("s"),
    ).select(key_col, "s.d", "s.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est")
        )
    )


# ------------------------------------------------------------------ HLL
#
# HyperLogLog (Flajolet et al. 2007, public algorithm) in the same
# relational, mergeable, engine-exact style as the count-min sketch
# above: the sketch IS a table of (group, idx, rho) register rows, so a
# DuckDB oracle replays build, merge, and the estimator bit-for-bit.
# Spark's own approx_count_distinct is an opaque binary HLL++ whose
# internals SQL cannot probe; this formulation trades a few bytes of
# density for full cross-engine checkability and union+MAX mergeability
# (1000 daily partials combine without rescanning raw data — register
# tables are m rows per group, independent of input size).
#
# Determinism: the 64-bit "hash" is the same md5-hex arithmetic as
# `sampling.hash_bucket` — register index from the first 4 hex chars
# (low p bits of a uniform 16-bit value), rank word from the next 12 hex
# chars (48 uniform bits). rho = leading-zeros-in-48-bits + 1 =
# 49 - length(bin(word)), integer-exact in both engines. The estimator's
# harmonic sum stays integral: zsum = Σ_j 2^(50-rho_j) (+ 2^50 per
# never-hit register) ≤ m·2^50 fits a bigint; the final
# alpha·m²·2^50/zsum is three IEEE-double ops in a pinned order, so even
# the float estimate is bit-identical across engines.

_HLL_RHO_MAX = 49  # 48 hash bits → rho ∈ [1, 49]


def _hll_alpha_num_den(m: int) -> tuple[int, int]:
    """alpha_m = 0.7213/(1+1.079/m) as an exact integer ratio
    (alpha ≈ num/den) so the estimator has no float constants beyond
    one literal. Rounded to 1e-5 — a shared constant, not a per-engine
    computation, so exactness across engines is unaffected."""
    num = round(0.7213 / (1 + 1.079 / m) * 100000)
    return num, 100000


def _hll_reg_cols(key_col: str, p: int, salt: str):
    """(idx, rho) register coordinates for one key occurrence."""
    m = 1 << p
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    idx = (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % m).alias("idx")
    word = F.conv(F.substring(h, 5, 12), 16, 10).cast("bigint")
    rho = (
        F.when(word == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(word)))
        .cast("bigint")
        .alias("rho")
    )
    return idx, rho


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Build per-group register tables (group..., idx, rho): one
    map-side-combined groupBy shuffling at most groups × 2^p rows."""
    groups = group_cols or []
    idx, rho = _hll_reg_cols(key_col, p, salt)
    return (
        df.select(*groups, idx, rho)
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables built with identical (p, salt):
    union + elementwise MAX — the distributed-combine step."""
    it = iter(sketches)
    merged = next(it)
    for s in it:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "rho"]
    return merged.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 8) -> DataFrame:
    """Raw HLL estimate per group from a register table. Emits the
    integer evidence (registers hit, zero registers, scaled harmonic
    sum) alongside the double estimate; the small-range
    linear-counting branch needs ln() whose cross-engine rounding is
    unpinned, so it is reported as the `lc_regime` boolean (the caller
    applies ln driver-side if it wants the corrected number)."""
    m = 1 << p
    a_num, a_den = _hll_alpha_num_den(m)
    groups = [c for c in sketch.columns if c not in ("idx", "rho")]
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("regs_hit"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({_HLL_RHO_MAX + 1} - rho as int))")
        )
        .cast("long")
        .alias("zsum_hit"),
    )
    zero_regs = (F.lit(m) - F.col("regs_hit")).cast("long")
    zsum = (
        F.col("zsum_hit")
        + zero_regs * F.lit(1 << (_HLL_RHO_MAX + 1)).cast("long")
    ).cast("long")
    est = (
        F.lit(a_num * m * m).cast("double")
        * F.lit(1 << (_HLL_RHO_MAX + 1)).cast("double")
        / F.lit(a_den).cast("double")
        / zsum.cast("double")
    )
    return agg.select(
        *groups,
        "regs_hit",
        zero_regs.alias("zero_regs"),
        zsum.alias("zsum"),
        est.alias("hll_est"),
        ((F.lit(5) * m).cast("double") / F.lit(2).cast("double") >= est).alias(
            "lc_regime"
        ),
    )


# ------------------------------------------------ histogram quantiles
#
# The third classic mergeable summary next to CMS (frequency) and HLL
# (cardinality): an equi-width histogram sketch for quantiles. Same
# relational discipline — the sketch IS a (group, bucket, cnt) table, so
# merge is union+SUM and a DuckDB oracle replays build, merge, and the
# quantile estimator exactly. Bucketization is ((v − lo)·bins)/(hi − lo)
# then floor — two pinned-order IEEE ops, so bucket assignment is
# bit-identical cross-engine; ranks are exact integers (ceil division);
# only the final interpolated estimate touches floats again (two pinned
# ops). Accuracy is the usual equi-width bound: error ≤ bucket width,
# shrinking linearly in `bins` — the trade for exact mergeability and
# replayability that opaque t-digest/KLL blobs can't offer SQL.


def _hist_bucket(value_col: str, lo: float, hi: float, bins: int):
    pos = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(lo)))
        * F.lit(float(bins))
        / F.lit(float(hi) - float(lo))
    ).cast("long")
    return F.least(F.lit(bins - 1).cast("long"), F.greatest(F.lit(0).cast("long"), pos))


def hist_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build per-group histogram sketch tables (group..., bucket, cnt):
    one map-side-combined groupBy of at most groups × bins rows.
    Out-of-range values clamp into the edge buckets (they stay counted —
    a sketch that silently drops rows lies about N)."""
    groups = group_cols or []
    return (
        df.select(*groups, _hist_bucket(value_col, lo, hi, bins).alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches built with identical (lo, hi, bins):
    union + SUM — the distributed-combine step."""
    it = iter(sketches)
    merged = next(it)
    for s in it:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    percentiles: list[int],
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a histogram sketch. For percentile p the
    target rank is ceil(N·p/100) (exact integers); the answering bucket
    is the unique one whose cumulative count crosses the rank; the
    estimate interpolates linearly inside it. Returns one row per
    (group, percentile) with the integer evidence (n_rows, bucket,
    rank, cum_before) next to the double estimate."""
    groups = [c for c in sketch.columns if c not in ("bucket", "cnt")]
    from pyspark.sql import Window

    if not groups:
        # the ungrouped sketch is bins-sized by construction (buckets
        # clamp to [0, bins-1]); the explicit limit puts that bound in
        # the PLAN, so the global cum-sum window below is provably over
        # a bounded frame (assert_no_global_window exempts limited
        # inputs) — and stays a no-op on the data
        sketch = sketch.limit(bins + 1)
    w = Window.partitionBy(*groups).orderBy("bucket") if groups else (
        Window.partitionBy().orderBy("bucket")
    )
    cum = sketch.select(
        *groups,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1))
        .cast("long")
        .alias("cum_before"),
        F.sum("cnt").over(Window.partitionBy(*groups) if groups else Window.partitionBy())
        .cast("long")
        .alias("n_rows"),
    ).withColumn("cum_before", F.coalesce("cum_before", F.lit(0).cast("long")))
    width = (float(hi) - float(lo)) / bins
    out = None
    for p in percentiles:
        # ceil(N·p/100) via (N·p + 99) div 100 — all operands positive,
        # so truncating and flooring division agree across engines
        rank = F.expr(f"(n_rows * {int(p)} + 99) div 100")
        frac = (rank - F.col("cum_before")).cast("double") / F.col("cnt").cast(
            "double"
        )
        est = F.lit(float(lo)) + (
            F.col("bucket").cast("double") + frac
        ) * F.lit(width)
        sel = (
            cum.withColumn("rank", rank.cast("long"))
            .filter(
                (F.col("cum") >= F.col("rank"))
                & (F.col("cum_before") < F.col("rank"))
            )
            .select(
                *groups,
                F.lit(int(p)).cast("long").alias("percentile"),
                "n_rows",
                "bucket",
                "rank",
                "cum_before",
                est.alias("estimate"),
            )
        )
        out = sel if out is None else out.unionByName(sel)
    return out


def cms_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    with identical (width, depth, salt): |A ⋈ B| = Σ_k a_k·b_k is
    estimated by min_d Σ_bucket a[d][b]·b[d][b] — the classic CMS
    inner-product bound (never underestimates, error ≤ ‖a‖₁‖b‖₁/width).
    This is how a planner sizes a join without touching either table:
    two sketch tables in, ONE number out, all integer arithmetic.

    Scale: both inputs are sketch-sized (depth × width rows) — the
    estimate costs a broadcast join of two tiny tables regardless of
    the joined tables' size."""
    a = sk_a.select("d", "bucket", F.col("cnt").alias("cnt_a"))
    b = sk_b.select("d", "bucket", F.col("cnt").alias("cnt_b"))
    per_d = (
        a.join(F.broadcast(b), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("ip"))
    )
    return per_d.agg(F.min("ip").cast("long").alias("join_size_est"))


def exact_quantile_twopass(
    df: DataFrame,
    value_col: str,
    percentile: int,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT percentile without a global sort — the two-pass refinement
    that makes exact medians feasible at 100 TB where
    `percentile(...)`'s sort-based plan is not:

    pass 1: the equi-width histogram sketch locates, per group, the
            bucket containing rank ⌈N·p/100⌉ (sketch-sized state);
    pass 2: ONLY rows inside that bucket are re-scanned and ranked —
            expected N/bins rows per group, a per-group local problem —
            and the (rank − cum_before)-th smallest value inside the
            bucket is the exact answer (k-th smallest VALUE semantics,
            well-defined under duplicates, engine-independent).

    Out-of-range values clamp into edge buckets in pass 1 and are
    admitted by unbounded edge predicates in pass 2, so the rank space
    is the FULL group either way. Returns (group..., percentile,
    n_rows, bucket, rank, exact_value)."""
    groups = group_cols or []
    sketch = hist_build(df, value_col, lo, hi, bins, groups or None)
    located = hist_quantiles(sketch, [percentile], lo, hi, bins).select(
        *groups, "n_rows", "bucket", "rank", "cum_before"
    )
    # membership MUST reuse the pass-1 bucketization expression verbatim:
    # range predicates recomputed as lo + bucket·width can disagree with
    # floor-arithmetic at float boundaries and silently shift the rank
    in_bucket = _hist_bucket(value_col, lo, hi, bins) == F.col("bucket")
    joined = (
        df.join(F.broadcast(located), groups) if groups
        else df.crossJoin(F.broadcast(located))
    ).filter(in_bucket)
    if groups:
        from pyspark.sql import Window

        w = Window.partitionBy(*groups).orderBy(F.col(value_col).cast("double"))
        ranked = joined.withColumn("__rk", F.row_number().over(w))
    else:
        # ungrouped: the in-bucket candidate frame is ~N/bins rows but
        # corpus-dependent (a skewed distribution can dump most rows in
        # one bucket), so rank it DISTRIBUTED rather than through an
        # unpartitioned window's single task
        from xeloader_spark.operators.rank import global_row_number

        ranked = global_row_number(
            joined, [F.col(value_col).cast("double")], out_col="__rk"
        )
    return (
        ranked.filter(F.col("__rk") == F.col("rank") - F.col("cum_before"))
        .select(
            *groups,
            F.lit(int(percentile)).cast("long").alias("percentile"),
            "n_rows",
            "bucket",
            "rank",
            F.col(value_col).cast("double").alias("exact_value"),
        )
    )
