"""Hashed-feature linear classifier as an oracle-checked query.

End-to-end train/predict in one plan: hash-split the documents table
90/10 (the same leakage-free split as `q_train_test_split`), train the
CCNet-style domain classifier on the train side, score the test side,
and emit each test doc's predicted source next to its actual source.
Every arithmetic step is integer-exact (md5 buckets, scaled-integer
division, BIGINT scores), so the DuckDB oracle replays the ENTIRE
train-and-predict pipeline and the driver's value hash must match —
the classifier is not spot-checked, it is replayed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import classify as cl
from ..operators import sampling as sp

_TEST_FRAC = 0.10


def q_domain_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on the 90% hash-split, predict source for the 10% test docs.

    Columns: doc_id, actual_source, predicted_source, pred_score.
    """
    docs = load_table(spark, sf_dir, "documents")
    split = sp.split_train_test(docs, "doc_id", test_fraction=_TEST_FRAC)
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")

    # r14: train on (label, bucket, tf=1) token rows — the per-doc
    # aggregate added a docs×buckets-keyed exchange training never
    # needed (Σ per-doc tf ≡ token count; the oracle's tr_feat CTE
    # already aggregates straight to (label, bucket))
    model = cl.train_hashed_linear(cl.hashed_class_tf(train, "source"))
    test_feats = cl.hashed_token_features(test, keep_cols=("source",))
    preds = cl.classify(
        test_feats.withColumnRenamed("source", "actual_source"),
        model,
        keep_cols=("actual_source",),
    )
    return preds.select(
        "doc_id",
        "actual_source",
        F.col("label").alias("predicted_source"),
        F.col("score").alias("pred_score"),
    )


def q_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle model inference: train on the 90% hash-split (two
    aggregate jobs collect the dense model — driver-sized, like a saved
    fastText binary), then score EVERY document as a pure projection —
    the packed-hex model lives inside the plan, so inference over any
    corpus size (or an unbounded stream: the operator is stateless) is
    exactly one scan. The oracle replays the identical arithmetic
    relationally, proving the projection encoding IS the model."""
    docs = load_table(spark, sf_dir, "documents")
    split = sp.split_train_test(docs, "doc_id", test_fraction=_TEST_FRAC)
    train = split.filter(F.col("split") == "train")
    # r14: (label, bucket, tf=1) training feed — see q_domain_classifier
    model = cl.train_hashed_linear(cl.hashed_class_tf(train, "source"))
    packed = cl.pack_model_hex(model)
    scored = cl.score_projection(docs, packed, keep_cols=("source",))
    return scored.select(
        "doc_id",
        F.col("source").alias("actual_source"),
        F.col("label").alias("predicted_source"),
        F.col("score").alias("pred_score"),
    )


# ---------------------------------------------------------------- oracles

_B = sp.BUCKETS  # split-hash resolution (10_000)
_NB = cl.N_BUCKETS
_SCALE = cl.SCALE
_SALT = cl.FEAT_SALT
_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"


def _bucket(key: str, salt: str, buckets: int) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {buckets})"
    )


ORACLES: dict[str, str] = {
    "q_classifier_inference": f"""
        WITH split AS (
            SELECT doc_id, text, source,
                   CASE WHEN {_bucket('doc_id', 'split', _B)}
                             < {int(_TEST_FRAC * _B)}
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        ),
        tr_feat AS (
            SELECT source AS label,
                   {_bucket('tok', _SALT, _NB)} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT source, unnest({_TOKS}) AS tok
                  FROM split WHERE split = 'train')
            GROUP BY 1, 2
        ),
        totals AS (
            SELECT label, CAST(SUM(cnt) AS BIGINT) AS total
            FROM tr_feat GROUP BY 1
        ),
        model AS (
            SELECT t.label, b.bucket,
                   ((COALESCE(f.cnt, 0) + 1) * {_SCALE})
                       // (t.total + {_NB}) AS w
            FROM totals t
            CROSS JOIN (SELECT range AS bucket FROM range({_NB})) b
            LEFT JOIN tr_feat f
              ON f.label = t.label AND f.bucket = b.bucket
        ),
        all_feat AS (
            SELECT doc_id, actual_source,
                   {_bucket('tok', _SALT, _NB)} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, source AS actual_source,
                         unnest({_TOKS}) AS tok
                  FROM split)
            GROUP BY 1, 2, 3
        ),
        scores AS (
            SELECT f.doc_id, f.actual_source, m.label,
                   CAST(SUM(f.tf * m.w) AS BIGINT) AS score
            FROM all_feat f JOIN model m ON f.bucket = m.bucket
            GROUP BY 1, 2, 3
        )
        SELECT doc_id, actual_source,
               label AS predicted_source,
               score AS pred_score
        FROM (SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY score DESC, label ASC) AS rn
              FROM scores)
        WHERE rn = 1
    """,
    "q_domain_classifier": f"""
        WITH split AS (
            SELECT doc_id, text, source,
                   CASE WHEN {_bucket('doc_id', 'split', _B)}
                             < {int(_TEST_FRAC * _B)}
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        ),
        tr_feat AS (
            SELECT source AS label,
                   {_bucket('tok', _SALT, _NB)} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT source, unnest({_TOKS}) AS tok
                  FROM split WHERE split = 'train')
            GROUP BY 1, 2
        ),
        totals AS (
            SELECT label, CAST(SUM(cnt) AS BIGINT) AS total
            FROM tr_feat GROUP BY 1
        ),
        model AS (
            SELECT t.label, b.bucket,
                   ((COALESCE(f.cnt, 0) + 1) * {_SCALE})
                       // (t.total + {_NB}) AS w
            FROM totals t
            CROSS JOIN (SELECT range AS bucket FROM range({_NB})) b
            LEFT JOIN tr_feat f
              ON f.label = t.label AND f.bucket = b.bucket
        ),
        te_feat AS (
            SELECT doc_id, actual_source,
                   {_bucket('tok', _SALT, _NB)} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, source AS actual_source,
                         unnest({_TOKS}) AS tok
                  FROM split WHERE split = 'test')
            GROUP BY 1, 2, 3
        ),
        scores AS (
            SELECT f.doc_id, f.actual_source, m.label,
                   CAST(SUM(f.tf * m.w) AS BIGINT) AS score
            FROM te_feat f JOIN model m ON f.bucket = m.bucket
            GROUP BY 1, 2, 3
        )
        SELECT doc_id, actual_source,
               label AS predicted_source,
               score AS pred_score
        FROM (SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY score DESC, label ASC) AS rn
              FROM scores)
        WHERE rn = 1
    """,
}


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the replayed classifier: rank ALL scored
    docs into score deciles (exact NTILE over a total (score, doc_id)
    order) and report per-decile accuracy — does higher confidence mean
    more correct? n/accuracy are integers + one IEEE division, so the
    oracle replays train → score → decile → rate end-to-end.

    Scale note: a bare `ntile(10).over(Window.orderBy(...))` would funnel
    every scored doc through ONE task. The deciles instead come from
    operators/rank.global_ntile — range-partitioned global rank plus the
    exact NTILE bucket formula — which keeps ANSI-NTILE semantics (so the
    DuckDB NTILE oracle still hash-matches) while every task ranks only
    its own score range. Pinned by assert_no_global_window suite-wide."""
    from xeloader_spark.operators.rank import global_ntile

    preds = q_classifier_inference(spark, sf_dir)
    d = global_ntile(
        preds, 10, [F.desc("pred_score"), F.asc("doc_id")], out_col="decile"
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            (F.col("predicted_source") == F.col("actual_source")).cast("long")
        )
        .cast("long")
        .alias("n_correct"),
        F.min("pred_score").cast("long").alias("min_score"),
        (
            F.sum(
                (F.col("predicted_source") == F.col("actual_source")).cast(
                    "long"
                )
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy"),
    )


ORACLES["q_classifier_calibration"] = f"""
    WITH inference AS ({ORACLES["q_classifier_inference"]}),
    d AS (
        SELECT *,
               CAST(NTILE(10) OVER (ORDER BY pred_score DESC, doc_id ASC)
                    AS BIGINT) AS decile
        FROM inference
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN predicted_source = actual_source
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(MIN(pred_score) AS BIGINT) AS min_score,
           CAST(SUM(CASE WHEN predicted_source = actual_source
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM d GROUP BY 1
"""
