"""Streaming frequent-pair counts — the streaming twin of
`operators.itemsets.frequent_pairs`' support core.

Structured Streaming allows one aggregation per query, so the twin works
on BASKET-ATOMIC input: each row is a whole basket with its distinct
item array (the shape an order-document or session-close stream
naturally has; the batch operator's first groupBy produces exactly this
frame). Pair carving is then the same stateless array-side expression
the batch operator uses — C(f, 2) candidates per basket inside the
projection, never a join — and the single streaming aggregation keeps
running pair supports (update mode, Spark-managed aggregate state: one
state row per distinct pair, the same cardinality as the batch pair
table).

The a-priori item prune is a TWO-pass decision (item supports over the
whole corpus) and so stays a batch/periodic concern: production streams
prune against a broadcast frequent-item list refreshed by the batch job;
the twin counts unpruned pairs, and parity with the batch operator at
min supports (1, 1) is pinned in `tests/test_streaming.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR_EXPR = (
    "flatten(transform(items, (x, i) -> "
    "transform(slice(items, i + 2, size(items)), "
    "y -> struct(x AS item_a, y AS item_b))))"
)


def basket_pairs_counts(baskets: DataFrame) -> DataFrame:
    """Running pair supports over a stream (or batch frame) of
    (basket, items array<long>) rows; items must be distinct and sorted
    per basket (the basket-atomic contract)."""
    return (
        baskets.select(F.explode(F.expr(PAIR_EXPR)).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
    )


def start_pair_counts(
    baskets: DataFrame, out_table: str, checkpoint: str, trigger_once: bool = True
):
    """Run the pair-support aggregate into a named memory sink (update
    mode — each micro-batch emits the pairs whose support changed)."""
    w = (
        basket_pairs_counts(baskets)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
