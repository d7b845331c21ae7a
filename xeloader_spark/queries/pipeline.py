"""The flagship composed LLM-data pipeline: one declarative DataFrame
program chaining four operator families —

    quality filter → near-dup cluster resolution (keep canonical)
                   → deterministic train/test split → corpus accounting

Every stage is individually oracle-checked elsewhere; this query checks
the COMPOSITION end-to-end (the oracle replays the full chain in DuckDB,
recursive component closure included). Execution shape at scale: the
quality filter and split are narrow (no shuffle), dedup shuffles on
shingle then pair keys, the cluster labels broadcast back, and the final
rollup is a two-key aggregate — the corpus itself crosses the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as dd
from ..operators import sampling as sp
from ..operators import text as tx
from .dedup import _JACCARD_T, clusters_sql, jaccard_pairs_sql
from .sampling import _B, _bucket_sql
from .text import _TOKS_LIST


def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning end-to-end, reported as per-(source, split) doc and
    token counts of the kept canonical documents."""
    docs = load_table(spark, sf_dir, "documents")
    # the filtered frame feeds both the shingle pipeline and the resolve
    # join — persisted (into the dedup module's registry, so callers'
    # release_persisted() frees it) to run the quality stats once
    kept = dd._persist(
        tx.quality_flag(tx.text_stats(docs))
        .filter(F.col("quality_ok"))
        .select("doc_id", "source", "n_tokens", "text")
    )
    pairs = dd.jaccard_pairs(dd.shingles(kept, n=3), threshold=_JACCARD_T)
    canonical = dd.resolve_duplicates(kept.drop("text"), pairs).filter(
        F.col("is_canonical")
    )
    split = sp.split_train_test(canonical, "doc_id", test_fraction=0.10)
    return split.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
    )


_REP_T = 0.2
_PROB_T = 0.0002


def q_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality SCORECARD: every filter signal family joined
    into one decision frame — Gopher rules, intra-doc repetition,
    corpus-unigram probability, language ID — plus the combined `keep`
    verdict (gopher ∧ rep_ratio ≤ 0.2 ∧ mean_tok_prob > 2e-4 ∧ lang
    identified). This is the frame a curation run materializes once and
    slices many times; all four signal joins are on doc_id, so AQE plans
    them as one co-partitioned join tree (the narrow signals are computed
    in the same scan where possible). Oracle composes the four
    already-proven signal oracles verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    gopher = tx.gopher_quality(docs).select(
        "doc_id", "n_words", "gopher_keep"
    )
    rep = tx.repetition_stats(docs, n=3).select("doc_id", "rep_ratio")
    uni = tx.unigram_doc_score(docs).select("doc_id", "mean_tok_prob")
    lang = tx.lang_id(docs).select("doc_id", "lang_guess")
    return (
        gopher.join(rep, "doc_id")
        .join(uni, "doc_id")
        .join(lang, "doc_id")
        .withColumn(
            "keep",
            F.col("gopher_keep")
            & (F.col("rep_ratio") <= _REP_T)
            & (F.col("mean_tok_prob") > _PROB_T)
            & (F.col("lang_guess") != "und"),
        )
    )


_QDOCS = f"""
    SELECT doc_id, source, text,
           CAST(len({_TOKS_LIST}) AS BIGINT) AS n_tokens
    FROM documents
    WHERE CAST(len({_TOKS_LIST}) AS BIGINT) >= 10
      AND (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
          * 1.0 / length(text) <= 0.3
"""

from .text import ORACLES as _TEXT_ORACLES

ORACLES: dict[str, str] = {
    "q_quality_scorecard": f"""
        SELECT g.doc_id, g.n_words, g.gopher_keep,
               r.rep_ratio, u.mean_tok_prob, l.lang_guess,
               (g.gopher_keep AND r.rep_ratio <= {_REP_T}
                AND u.mean_tok_prob > {_PROB_T}
                AND l.lang_guess <> 'und') AS keep
        FROM ({_TEXT_ORACLES['q_gopher_quality']}) g
        JOIN ({_TEXT_ORACLES['q_repetition_stats']}) r ON g.doc_id = r.doc_id
        JOIN ({_TEXT_ORACLES['q_unigram_doc_prob']}) u ON g.doc_id = u.doc_id
        JOIN ({_TEXT_ORACLES['q_lang_id']}) l ON g.doc_id = l.doc_id
    """,
    "q_corpus_clean_pipeline": f"""
        WITH RECURSIVE qdocs AS ({_QDOCS}),
        pairs AS ({jaccard_pairs_sql('qdocs')}),
        {clusters_sql('pairs', 'qdocs')},
        canon AS (
            SELECT q.source, q.doc_id, q.n_tokens
            FROM resolved r JOIN qdocs q ON r.doc_id = q.doc_id
            WHERE r.is_canonical
        )
        SELECT source,
               CASE WHEN {_bucket_sql('doc_id', 'split')} < {int(0.10 * _B)}
                    THEN 'test' ELSE 'train' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
        FROM canon GROUP BY 1, 2
    """,
}
