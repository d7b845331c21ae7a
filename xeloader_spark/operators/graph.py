"""Graph analytics over edge lists (k-NN graphs, lineage chains).

The reference feeds a relational store and leaves graph questions to
downstream tools; at training-data scale the k-NN graph built by
`operators/similarity.knn_graph` immediately raises "which documents are
central / representative?" — PageRank is the canonical answer and the
canonical iterative-dataflow workload, so it doubles as the engine's
demonstration that fixed-point algorithms stay shuffle-frugal in
DataFrame form (SURVEY §2 extension surface; cluster resolution in
`operators/dedup.py` is the other iterative family).

Determinism across engines: floating-point PageRank sums neighbor
contributions in nondeterministic order, so ranks are kept in integer
micro-units (`scale` = 1e12 per unit of probability mass). Integer
division (`DIV` / DuckDB `//`) is floor division — identical for the
non-negative quantities here — and integer addition is
order-independent, so every iteration is bit-exact in both engines and
the whole fixed-point unrolls into plain SQL. The floor rounding leaks
O(outdeg) micro-units of mass per node per round — quantization noise
~1e-9 of total mass, far below any ranking-relevant difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Quantized-integer PageRank over a directed edge list.

    new_rank = (1-d)/n + d * Σ_in rank/outdeg, d = damp_num/damp_den,
    all in integer micro-units. Nodes = endpoints of `edges`; nodes that
    appear only as destinations hold rank but emit nothing (their mass
    leaks, the simple-variant convention — at web scale you'd
    redistribute dangling mass; for k-NN centrality the leak is
    irrelevant and keeps the iteration to one join + one aggregate).

    Scale shape: the edge list is the big object and it shuffles ONCE up
    front (outdeg aggregate + join, then eager localCheckpoint so no
    round re-pays it). Each round then shuffles edge-sized (dst, contrib)
    pairs into a node-sized aggregate and left-joins node-sized frames —
    2 shuffles per round over data that never exceeds the edge count,
    with the rank frame localCheckpoint-ed every round so the logical
    plan stays O(1) per round instead of O(iters) (same discipline as
    `bpe_train`'s checkpoint cadence). The driver holds only n (one
    count scalar), never rows.
    """
    # materialize the edge list ONCE — nodes, outdegrees, and every
    # iteration all derive from this checkpoint, so an expensive edge
    # producer (e.g. the banded-LSH k-NN self-join) runs a single time
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    init = scale // n
    base = ((damp_den - damp_num) * init) // damp_den

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = nodes.select("id", F.lit(init).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            ew.join(ranks, ew.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damp_num} * coalesce(s, 0L)) div {damp_den}"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "id",
        F.col("rank").alias("rank_micro"),
        (F.col("rank").cast("double") / F.lit(float(scale))).alias("rank"),
    )
