"""Stream-static LM quality scoring — the serving shape of
`operators/text.bigram_stupid_backoff`.

In production the LM statistics are trained in batch (they ARE the
model) while documents arrive as a stream to be scored. The stats
tables are vocabulary-sized — far too big for plan literals (the
frozen-stats trick `bm25_stream` uses fits because BM25 needs only the
query terms' dfs) — so the scoring joins run as Spark STREAM-STATIC
joins: stateless, no watermark, no state store; the static side is
just a DataFrame the planner re-reads per micro-batch.

The streaming output is per-BIGRAM scored rows (doc_id, w1, w2,
score_scaled, is_backoff): the explode and the two probe joins are all
stateless, so state is exactly ZERO rows regardless of stream length.
The per-document reduction (n_bigrams, n_backoff, sum) is a downstream
batch aggregate over the sink — documents are atomic rows of the
stream, so every bigram of a doc lands in the same micro-batch and the
sink-side reduction is exact (parity with the batch operator pinned in
tests/test_streaming.py).

The one corpus-scalar stat (N = total train tokens) is rendered as a
BIGINT literal — L-suffixed per the int-literal rendering rule (the r6
ANSI overflow class; property-tested in test_properties.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import _tok_array


def train_backoff_stats(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Batch-train the stupid-backoff statistics on a (sub)corpus:
    (bigram table with folded c(w1), unigram table, N). The md5 split
    gating is the CALLER's concern — pass the train frame."""
    toks = _tok_array(text_col)
    bigrams = (
        f"CASE WHEN size(_toks) < 2 THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - 1), "
        f"i -> named_struct('w1', element_at(_toks, i), "
        f"'w2', element_at(_toks, i + 1))) END"
    )
    base = df.select(F.expr(toks).alias("_toks"))
    ug = (
        base.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c_uni"))
    )
    bi = (
        base.select(F.explode(F.expr(bigrams)).alias("_b"))
        .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_bi"))
        .join(
            ug.withColumnRenamed("w", "w1").withColumnRenamed(
                "c_uni", "c_w1"
            ),
            "w1",
        )
    )
    n_train = base.agg(F.sum(F.expr("size(_toks)")).cast("long")).first()[0]
    return bi, ug, int(n_train or 0)


def backoff_score_stream(
    stream: DataFrame,
    train_bi: DataFrame,
    train_ug: DataFrame,
    n_train: int,
    scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a document stream against static stupid-backoff stats:
    per-bigram rows (doc_id, w1, w2, score_scaled, is_backoff). All
    stateless — one explode + two stream-static left joins + a codegen
    projection; the same CASE template as the batch operator, so
    values are identical bigram-for-bigram."""
    toks = _tok_array(text_col)
    bigrams = (
        f"CASE WHEN size(_toks) < 2 THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - 1), "
        f"i -> named_struct('w1', element_at(_toks, i), "
        f"'w2', element_at(_toks, i + 1))) END"
    )
    s, n = int(scale), int(n_train)
    score_bi = (
        stream.select(
            F.col(id_col).alias("doc_id"), F.expr(toks).alias("_toks")
        )
        .select("doc_id", F.explode(F.expr(bigrams)).alias("_b"))
        .select(
            "doc_id",
            F.col("_b.w1").alias("w1"),
            F.col("_b.w2").alias("w2"),
        )
    )
    return (
        score_bi.join(train_bi, ["w1", "w2"], "left")
        .join(
            train_ug.withColumnRenamed("w", "w2").withColumnRenamed(
                "c_uni", "c_w2"
            ),
            "w2",
            "left",
        )
        .select(
            "doc_id",
            "w1",
            "w2",
            F.expr(
                f"CASE WHEN c_bi IS NOT NULL THEN (c_bi * {s}L) DIV c_w1 "
                f"WHEN {n}L = 0 THEN 0L "
                f"ELSE (2 * {s}L * coalesce(c_w2, 0L)) DIV (5 * {n}L) END"
            ).alias("score_scaled"),
            F.expr("c_bi IS NULL").alias("is_backoff"),
        )
    )
