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

State-bound story (r5 verdict #7): `basket_pairs_counts` accumulates
MONOTONICALLY — one state row per distinct pair ever seen, the same
cardinality as the batch pair table. That is the right twin for
"running supports since epoch" but its state grows with the pair
vocabulary; for an unbounded stream use
`basket_pairs_counts_windowed`, which keys the aggregate on an event-
time window under a watermark so Spark EVICTS closed windows' state —
bounded by pairs-per-open-window × open windows regardless of stream
age. Eviction and the measured state bound are pinned in
`tests/test_streaming.py::test_streaming_pair_counts_windowed_evicts_state`.
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


def basket_pairs_counts_windowed(
    baskets: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Windowed pair supports with bounded state: the same array-side
    pair carve, aggregated per (event-time window, pair) under a
    watermark. Closed windows' state is evicted by Spark once the
    watermark passes window_end + delay, so total state is
    O(pairs-per-open-window × open windows) — independent of stream
    age, unlike the running variant. Baskets arriving later than the
    watermark delay are dropped (the standard late-data trade; size the
    delay to the stream's real skew). Pair fan-out is C(basket_size, 2)
    per basket — on mega-basket domains slice the sorted item array to a
    cap before this operator (the batch a-priori operator's
    `max_basket_items` policy). Works in update mode (emit
    changed supports per micro-batch) or append mode (emit each window
    once, when it finalizes — the shape a downstream batch prune job
    consumes)."""
    return (
        baskets.withWatermark(ts_col, watermark_delay)
        .select(F.col(ts_col), F.explode(F.expr(PAIR_EXPR)).alias("p"))
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("p.item_a").alias("item_a"),
            F.col("p.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
        .select(
            F.col("win.start").alias("window_start"),
            "item_a",
            "item_b",
            "pair_support",
        )
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
