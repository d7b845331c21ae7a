"""Blocked record linkage — multi-field weighted entity matching.

The classic entity-resolution shape for STRUCTURED records (Fellegi &
Sunter 1969, the public framework; Newcombe's blocking): candidate
pairs come from an equi-join on a cheap blocking key (never the
all-pairs space), each candidate pair gets a per-field agreement
vector, and a weighted agreement score against a threshold decides the
link. This complements the document near-dup family (shingle/MinHash/
SimHash work on one long text field; linkage scores several short
typed fields) and the sorted-neighborhood merge/purge operator (SNM
bounds candidates by sort-order adjacency; blocking bounds them by key
equality — the two standard candidate-generation strategies).

Deterministic variant: field weights are INTEGER plan constants
supplied by the caller (the trained Fellegi-Sunter m/u log-odds are a
batch estimation concern, like the classifier's training pass — at
score time weights are literals either way), agreement is exact
equality per field, and the score is a BIGINT sum — so the whole
linkage replays in a SQL oracle, like every other operator here.

Scale shape: ONE equi-join on the blocking key (both sides shuffle on
the block key, or the smaller side broadcasts under the threshold —
optimizer's choice, no hint: both sides scale with the corpus);
agreement scoring is a pure codegen projection over the joined frame;
the threshold filter prunes before anything else moves. Block-size
skew is the caller's lever (compose the key from more fields to split
hot blocks — the same guidance as SNM's blocking key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agreement_score(
    agreements: list[tuple[str, str, int]],
) -> tuple[Column, Column]:
    """(score, n_agreements) columns from [(left_col, right_col,
    weight)]: per field, weight if equal (null-safe: two NULLs do NOT
    agree — unknown is not evidence), else 0."""
    score = F.lit(0)
    n = F.lit(0)
    for lc, rc, w in agreements:
        hit = F.col(lc).isNotNull() & (F.col(lc) == F.col(rc))
        score = score + F.when(hit, int(w)).otherwise(0)
        n = n + F.when(hit, 1).otherwise(0)
    return score.cast("long").alias("score"), n.cast("long").alias(
        "n_agreements"
    )


def blocked_link(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    agreements: list[tuple[str, str, int]],
    threshold: int,
    left_key: str = "left_key",
    right_key: str = "right_key",
) -> DataFrame:
    """Link records across two frames sharing the blocking columns:
    equi-join on `block_cols`, score the field agreements, keep pairs
    with score ≥ threshold. Callers pre-alias field columns so left and
    right names are disjoint (the linkage analogue of a join condition
    list). Returns (left_key, right_key, score, n_agreements)."""
    score, n = agreement_score(agreements)
    return (
        left.join(right, block_cols)
        .select(left_key, right_key, score, n)
        .filter(F.col("score") >= int(threshold))
    )
