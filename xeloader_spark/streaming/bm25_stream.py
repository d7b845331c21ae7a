"""Stream-static BM25 scoring — the streaming twin of
`operators.text.bm25_topk`'s scoring core.

The production retrieval deployment splits BM25 in two: corpus
statistics (N, total length, per-term document frequencies) are a batch
concern refreshed periodically, while INCOMING documents are scored
against the frozen stats as they arrive. This module is that second
half: `bm25_frozen_stats` collects the driver-sized stats row from a
batch corpus, and `bm25_score_stream` renders the SAME integer
contribution SQL as the batch operator (shared templates
`bm25_contrib_sqls` / `bm25_dlnorm_sql` — the stats arrive as int
literals instead of column refs, everything else is byte-identical
arithmetic) as a stateless projection over the stream.

State bound: ZERO — no aggregate, no watermark, one row in → one scored
row out; the only "state" is the plan-literal stats (a handful of ints).
Global top-k over a stream needs an aggregate by definition and stays a
downstream/batch concern (rank the sink periodically); per-document
scores are what the stream can produce exactly, and they are pinned
bit-equal to the batch operator's pre-top-k scores in
`tests/test_streaming.py::test_streaming_bm25_scores_match_batch`.

Staleness semantics are the operator's contract, not a bug: between
stats refreshes a new term's df stays at its frozen value, exactly like
any search engine serving reads from a periodically rebuilt index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import (
    _tok_array,
    bm25_contrib_sqls,
    bm25_dlnorm_sql,
)


def bm25_frozen_stats(
    corpus: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
) -> dict:
    """One map-side-combined aggregate over the batch corpus →
    driver-sized frozen stats: {"n_docs", "tot_len", "df": [per term]}.
    The same (n_docs, tot_len, df…) row `bm25_topk` computes and
    broadcasts; here it is collected so the streaming projection can
    embed it as plan literals."""
    for t in terms:
        if "'" in t or "\\" in t:
            raise ValueError(f"term must not contain quotes/backslashes: {t!r}")
    toks = _tok_array(text_col)
    row = (
        corpus.select(F.expr(toks).alias("_toks"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("CAST(size(_toks) AS BIGINT)"))
            .cast("long")
            .alias("tot_len"),
            *[
                F.sum(
                    F.expr(
                        f"CASE WHEN array_contains(_toks, '{t}') THEN 1 ELSE 0 END"
                    )
                )
                .cast("long")
                .alias(f"df{i}")
                for i, t in enumerate(terms)
            ],
        )
        .collect()[0]
    )
    if int(row.n_docs) == 0:
        raise ValueError(
            "bm25_frozen_stats: empty corpus — frozen stats need at "
            "least one document (tot_len/df aggregate to NULL on zero "
            "rows)"
        )
    return {
        "n_docs": int(row.n_docs),
        "tot_len": int(row.tot_len),
        "df": [int(row[f"df{i}"]) for i in range(len(terms))],
    }


def bm25_score_stream(
    docs: DataFrame,
    stats: dict,
    terms: tuple[str, ...],
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    idf_scale: int = 1_000_000,
    sat_scale: int = 10_000,
    dl_scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a document stream (or batch frame — the parity pin runs
    both) against frozen corpus stats: per doc (doc_id, dl, n_matched,
    score), the exact integer BM25 the batch operator computes before
    its top-k. Pure stateless projection — works under any output mode,
    no watermark, no shuffle."""
    for t in terms:
        if "'" in t or "\\" in t:
            raise ValueError(f"term must not contain quotes/backslashes: {t!r}")
    if stats["n_docs"] <= 0 or stats["tot_len"] <= 0:
        raise ValueError(f"frozen stats must be from a non-empty corpus: {stats}")
    n_docs, tot_len = int(stats["n_docs"]), int(stats["tot_len"])
    dfs = [int(d) for d in stats["df"]]
    if len(dfs) != len(terms):
        raise ValueError(f"stats carry {len(dfs)} dfs for {len(terms)} terms")
    toks = _tok_array(text_col)
    base = docs.select(
        F.col(id_col),
        F.expr(toks).alias("_toks"),
    ).withColumn("_dl", F.expr("CAST(size(_toks) AS BIGINT)"))
    tf_cols = [
        F.expr(f"CAST(size(filter(_toks, x -> x = '{t}')) AS BIGINT)").alias(
            f"_tf{i}"
        )
        for i, t in enumerate(terms)
    ]
    # L-suffixed literals: bare ints are int32 in Spark SQL, and the
    # folded idf product (2*(N-df)+1)*idf_scale overflows int32 for any
    # corpus with N-df >= 1074 (ANSI mode -> ARITHMETIC_OVERFLOW at plan
    # time; repro'd at 5000 docs). BIGINT literals keep the whole
    # expression 64-bit, matching the batch path's BIGINT columns.
    contrib = bm25_contrib_sqls(
        len(terms), k1, b, idf_scale, sat_scale, dl_scale,
        n_docs_sql=f"{n_docs}L",
        df_sqls=[f"{d}L" for d in dfs],
    )
    return (
        base.select(
            F.col(id_col),
            F.col("_dl").alias("dl"),
            F.expr(
                bm25_dlnorm_sql(f"{n_docs}L", f"{tot_len}L", dl_scale)
            ).alias("_dlnorm"),
            *tf_cols,
        )
        .select(
            F.col(id_col),
            F.col("dl"),
            sum(
                (
                    F.expr(f"CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END")
                    for i in range(len(terms))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_matched"),
            sum((F.expr(e) for e in contrib), F.lit(0))
            .cast("long")
            .alias("score"),
        )
    )
