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

from ..operators.text import _tok_array, backoff_contrib_sql, bigram_array_sql


def train_backoff_stats(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Batch-train the stupid-backoff statistics on a (sub)corpus:
    (bigram table with folded c(w1), unigram table, N as int). Thin
    wrapper over the batch operator's `backoff_train_stats` (ONE
    training implementation — shared-template discipline); the md5
    split gating is the CALLER's concern — pass the train frame."""
    from ..operators.text import backoff_train_stats

    bi, ug, n_train = backoff_train_stats(df, text_col=text_col)
    n = n_train.first()[0]
    return bi, ug, int(n or 0)


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
    n = int(n_train)
    score_bi = (
        stream.select(
            F.col(id_col).alias("doc_id"), F.expr(toks).alias("_toks")
        )
        .select("doc_id", F.explode(F.expr(bigram_array_sql())).alias("_b"))
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
            # the batch operator's CASE template with N as an
            # L-suffixed literal (the int-literal rendering rule)
            F.expr(backoff_contrib_sql(scale, f"{n}L")).alias(
                "score_scaled"
            ),
            F.expr("c_bi IS NULL").alias("is_backoff"),
        )
    )
