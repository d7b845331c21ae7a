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
