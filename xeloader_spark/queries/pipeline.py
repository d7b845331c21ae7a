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


_QDOCS = f"""
    SELECT doc_id, source, text,
           CAST(len({_TOKS_LIST}) AS BIGINT) AS n_tokens
    FROM documents
    WHERE CAST(len({_TOKS_LIST}) AS BIGINT) >= 10
      AND (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
          * 1.0 / length(text) <= 0.3
"""

ORACLES: dict[str, str] = {
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
