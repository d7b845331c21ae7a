"""Stream-static Bloom-pruned join — the streaming twin of
`operators.skew.bloom_prune_join`.

Enriching an unbounded fact stream against a selective static dimension
is the classic stream-static join; at scale most stream rows die in the
join. Here the dim side's keys are compressed ONCE, at plan-build time,
into the same m-bit word-packed Bloom bitset the batch operator builds —
but embedded as a literal `map(...)` expression (one SQL string, never a
per-entry Column tree), so the stream-side probe is a pure stateless
projection: k O(1) mask tests per row inside whole-stage codegen, no
broadcast exchange, no join state for the doomed rows. Survivors then
take the ordinary stream-static inner equi-join.

Semantics are identical to joining without the prune (no false
negatives; the join removes false positives) — pinned against the batch
operator in `tests/test_streaming.py`. The literal bitset snapshots the
dim at plan time, which is exactly the stream-static join's own
semantics for a static DataFrame source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.skew import bloom_hit_expr, bloom_words_df


def literal_bloom_map(
    dim: DataFrame, dim_key: str, m: int = 32_768, k: int = 3
) -> str:
    """Collect the dim side's word-packed Bloom bitset and render it as
    a literal `map(widx, word, ...)` SQL expression (≤ m/64 entries —
    512 at the default m — only non-zero words are kept)."""
    rows = bloom_words_df(dim, dim_key, m, k).collect()
    if not rows:
        return "map()"
    entries = ", ".join(
        f"{int(r.widx)}, {int(r.word)}L"
        for r in sorted(rows, key=lambda r: r.widx)
    )
    return f"map({entries})"


def bloom_pruned_stream_join(
    stream_fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 32_768,
    k: int = 3,
) -> DataFrame:
    """Prune `stream_fact` by the literal Bloom bitset of `dim`'s keys,
    then inner-join the survivors to `dim`. Works identically on a
    batch fact frame (the parity oracle)."""
    wmap = literal_bloom_map(dim, dim_key, m, k)
    pruned = stream_fact.filter(F.expr(bloom_hit_expr(fact_key, wmap, m, k)))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
