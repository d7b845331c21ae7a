"""Exact-arithmetic distributed k-means (Lloyd's algorithm).

The iterative-algorithm pattern on Spark, engine-exact: every round is
one scan (assignment is a pure projection — the k centroids live in the
*plan* as literal arrays, so no join and no shuffle) plus one small
aggregation (per-(cluster, dim) integer sums; output is k × dim rows).
The centroid table — the only driver-sized state, exactly what MLlib's
KMeans reduces per iteration — is collected each round, which also
truncates the lineage so T rounds don't compound the plan.

Engine-exactness (the same discipline as the TF-IDF / classifier
operators — no step a SQL oracle can't replay bit-for-bit):

- vectors quantized to ``round(v · scale)`` **shifted by +scale** into
  non-negative space: squared-L2 distances are shift-invariant, and the
  centroid update ``SUM div COUNT`` on non-negative integers is the same
  floor division in Spark, Python, and DuckDB (negative integer division
  truncates in Spark but floors in DuckDB — the shift removes the
  disagreement instead of papering over it).
- deterministic init: the k vectors with the smallest
  ``(md5(id), id)`` — hash-ordered, so every engine picks the same seeds.
- assignment ties go to the smallest cluster index (struct min).
- empty clusters keep their previous centroid.

Fixed iteration count (no convergence float), so the DuckDB oracle
unrolls the rounds as CTEs and the driver's value hash must match —
the clustering is replayed, not spot-checked.

At 100 TB: per round = one corpus scan + a k×dim-row aggregate. The
corpus is never collected, never joined against itself, and never
shuffled on a wide key; `q.persist()` keeps the quantized projection hot
across rounds. This is the exact-arithmetic twin of the offline codebook
training that `similarity.ivf_topk` consumes via its pre-trained `model`
parameter (the ml.KMeans float path stays the production fit; this one
is the driver-checkable variant of the same coarse quantizer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K = 8
ITERS = 3
SCALE = 1000

_PERSISTED: list[DataFrame] = []


def release_persisted() -> int:
    n = len(_PERSISTED)
    for df in _PERSISTED:
        df.unpersist()
    _PERSISTED.clear()
    return n


def _quantized(
    emb_df: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, qarr): non-negative shifted integer vectors."""
    return emb_df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, v -> "
            f"CAST(round(CAST(v AS DOUBLE) * {scale}) AS BIGINT) + {scale})"
        ).alias("qarr"),
    )


def _dist_to(centroid: list[int]) -> Column:
    carr = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with("qarr", carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Add (cluster, dist) via a pure projection: one struct-min over the
    k literal centroid arrays — zero joins, zero shuffles."""
    best = F.least(
        *[
            F.struct(
                _dist_to(c).alias("d"), F.lit(j).cast("int").alias("c")
            )
            for j, c in enumerate(centroids)
        ]
    )
    return q.select(
        "id",
        "qarr",
        best.getField("c").alias("cluster"),
        best.getField("d").alias("dist"),
    )


def kmeans_exact(
    emb_df: DataFrame,
    k: int = K,
    iters: int = ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Run `iters` Lloyd rounds; return (vec_id, cluster, dist) under the
    final centroids. `dist` is squared L2 in quantized space (BIGINT;
    shift-invariant, so it equals the unshifted quantized distance)."""
    q = _quantized(emb_df, id_col, vec_col, scale).persist()
    _PERSISTED.append(q)

    init_rows = (
        q.select("id", "qarr", F.md5(F.col("id").cast("string")).alias("hk"))
        .orderBy("hk", "id")
        .limit(k)
        .collect()
    )
    centroids = [list(r.qarr) for r in init_rows]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = _assign(q, centroids)
        stats = (
            assigned.select(
                "cluster", F.posexplode("qarr").alias("pos", "qv")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new: dict[int, list[int]] = {}
        for r in stats:
            new.setdefault(r.cluster, [0] * dim)[r.pos] = r.s // r.n
        centroids = [new.get(j, centroids[j]) for j in range(k)]

    return _assign(q, centroids).select(
        F.col("id").alias("vec_id"), "cluster", "dist"
    )
