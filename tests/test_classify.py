"""Hashed-feature linear classifier: learning behavior and scale shape.

Cross-engine arithmetic parity for `q_domain_classifier` is covered by
test_oracle_parity (the oracle replays train-and-predict end to end);
these tests pin what parity can't — that the classifier actually learns
when signal exists, that unseen vocabulary is handled by the dense
smoothed model, and that the scoring plan broadcasts the model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xeloader_spark.operators import classify as cl
from xeloader_spark.plans.inspect import assert_broadcast_join


def _fixture(spark):
    """Three classes with disjoint planted vocabulary + shared noise."""
    rows = []
    vocab = {
        "sport": "goal match team score league",
        "cooking": "recipe flour oven bake simmer",
        "law": "court statute ruling appeal clause",
    }
    i = 0
    for label, words in vocab.items():
        for k in range(8):
            # planted signal tokens repeated, plus shared filler
            text = f"{words} {words} the of and {k}"
            rows.append((i, label, text))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "label", "text"])


class TestLearns:
    def test_self_accuracy_on_planted_vocab(self, spark):
        docs = _fixture(spark)
        feats = cl.hashed_token_features(docs, keep_cols=("label",))
        model = cl.train_hashed_linear(feats)
        preds = cl.classify(
            feats.withColumnRenamed("label", "actual"),
            model,
            keep_cols=("actual",),
        )
        got = preds.select("doc_id", "actual", "label").collect()
        assert len(got) == 24
        acc = sum(1 for r in got if r.actual == r.label) / len(got)
        assert acc == 1.0, f"planted-vocab self-accuracy {acc} < 1.0"

    def test_unseen_vocab_still_scored_once(self, spark):
        docs = _fixture(spark)
        feats = cl.hashed_token_features(docs, keep_cols=("label",))
        model = cl.train_hashed_linear(feats)
        new = spark.createDataFrame(
            [(100, "zzz qqq xxyyzz unseen tokens entirely")],
            ["doc_id", "text"],
        )
        preds = cl.classify(cl.hashed_token_features(new), model).collect()
        assert len(preds) == 1
        assert preds[0].label in {"sport", "cooking", "law"}

    def test_model_is_dense(self, spark):
        docs = _fixture(spark)
        feats = cl.hashed_token_features(docs, keep_cols=("label",))
        model = cl.train_hashed_linear(feats)
        assert model.count() == 3 * cl.N_BUCKETS
        # every cell has a positive weight (smoothing floor)
        assert model.filter(F.col("w") <= 0).count() == 0


class TestScaleShape:
    def test_model_broadcasts_in_scoring_plan(self, spark):
        docs = _fixture(spark)
        feats = cl.hashed_token_features(docs, keep_cols=("label",))
        model = cl.train_hashed_linear(feats)
        preds = cl.classify(feats.withColumnRenamed("label", "actual"), model,
                            keep_cols=("actual",))
        assert_broadcast_join(preds)


class TestProjectionInference:
    def test_projection_matches_aggregate_path(self, spark):
        docs = _fixture(spark)
        feats = cl.hashed_token_features(docs)
        model = cl.train_hashed_linear(
            cl.hashed_token_features(docs, keep_cols=("label",))
        )
        agg = {
            r.doc_id: (r.label, r.score)
            for r in cl.classify(feats, model).collect()
        }
        proj = {
            r.doc_id: (r.label, r.score)
            for r in cl.score_projection(docs, cl.pack_model_hex(model)).collect()
        }
        assert agg == proj

    def test_zero_shuffle_plan(self, spark):
        from xeloader_spark.plans.inspect import count_exchanges

        docs = _fixture(spark)
        model = cl.train_hashed_linear(
            cl.hashed_token_features(docs, keep_cols=("label",))
        )
        scored = cl.score_projection(docs, cl.pack_model_hex(model))
        assert count_exchanges(scored) == 0

    def test_streaming_inference_matches_batch(self, spark, tmp_path):
        """The stateless projection scores a document STREAM identically
        to the batch run — model-in-the-plan inference needs no state,
        no watermark, no output-mode caveats."""
        docs = _fixture(spark)
        model = cl.train_hashed_linear(
            cl.hashed_token_features(docs, keep_cols=("label",))
        )
        packed = cl.pack_model_hex(model)
        batch = {
            r.doc_id: (r.label, r.score)
            for r in cl.score_projection(docs, packed).collect()
        }

        src = str(tmp_path / "cls_in")
        out = str(tmp_path / "cls_out")
        ckpt = str(tmp_path / "cls_ckpt")
        docs.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(docs.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            cl.score_projection(stream, packed)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.doc_id: (r.label, r.score)
            for r in spark.read.parquet(out).collect()
        }
        assert got == batch


class TestTrainFeeds:
    def test_class_tf_feed_trains_identical_model(self, spark):
        """r14: the (label, bucket, tf=1) training feed skips the per-doc
        aggregate but must train the EXACT same dense model — Σ per-doc
        tf is the global token count."""
        docs = _fixture(spark)
        via_docs = cl.train_hashed_linear(
            cl.hashed_token_features(docs, keep_cols=("label",))
        )
        direct = cl.train_hashed_linear(cl.hashed_class_tf(docs))
        assert via_docs.exceptAll(direct).count() == 0
        assert direct.exceptAll(via_docs).count() == 0

    def test_class_tf_single_exchange(self, spark):
        """The training feed's aggregation plans exactly ONE exchange
        (label,bucket partial+final) — the point of the fast path."""
        from xeloader_spark.plans.inspect import count_exchanges

        docs = _fixture(spark)
        counts = cl.hashed_class_tf(docs).groupBy("label", "bucket").agg(
            F.sum("tf").alias("cnt")
        )
        assert count_exchanges(counts) == 1
