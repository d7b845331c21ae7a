"""Operator-level pins for positional phrase search: the overlap and
normalization cases that distinguish a positional matcher from
substring counting (cross-engine value parity for q_phrase_search lives
in the oracle sweep)."""

from __future__ import annotations

from xeloader_spark.operators.phrase import build_postings, phrase_match
from xeloader_spark.plans.inspect import count_exchanges

DOCS = [
    (1, "Spark  window SPARK window spark"),  # case + double space
    (2, "a a a b"),  # self-overlap territory
    (3, "nothing relevant here"),
]


def _match(spark, phrases):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    return {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in phrase_match(docs, pdf).collect()
    }


def test_phrase_overlap_counted_positionally(spark):
    out = _match(spark, ["a a"])
    # 'a a a' holds TWO overlapping occurrences (starts 0 and 1) — the
    # case substring replace-counting collapses to one
    assert out == {("a a", 2): (0, 2)}


def test_phrase_case_and_whitespace_normalized(spark):
    out = _match(spark, ["window spark", "spark window"])
    assert out[("window spark", 1)] == (1, 2)
    assert out[("spark window", 1)] == (0, 2)


def test_phrase_no_hit_and_empty_phrase_absent(spark):
    out = _match(spark, ["quantum flux", "", "   "])
    assert out == {}  # no-hit phrases produce no rows; empty filtered


def test_postings_zero_shuffle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert count_exchanges(build_postings(docs)) == 0


def test_literal_hof_form_matches_index_form(spark):
    """The stream-safe literal-HOF matcher (streaming/phrase_stream) and
    the postings-index operator must agree row-for-row — the robots
    literal-vs-table parity discipline applied to phrase search."""
    from xeloader_spark.streaming.phrase_stream import match_phrases

    phrases = ["a a", "window spark", "quantum flux"]
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    lit = {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in match_phrases(docs, phrases).collect()
    }
    assert lit == _match(spark, phrases)


def test_match_phrases_streaming_stateless_and_batch_equal(spark, tmp_path):
    from xeloader_spark.streaming.phrase_stream import match_phrases

    phrases = ["a a", "window spark"]
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    root = str(tmp_path / "docs_in")
    docs.repartition(2).write.mode("overwrite").parquet(root)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        match_phrases(stream, phrases)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("phrase_hits_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(
        not p.get("stateOperators") for p in q.recentProgress
    ), "literal phrase matching must carry no state operators"
    got = {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in spark.sql("SELECT * FROM phrase_hits_t").collect()
    }
    want = {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in match_phrases(docs, phrases).collect()
    }
    assert got == want and got


def test_phrase_query_plan_shape(spark):
    """q_phrase_search plan budget: the phrase side broadcasts (query-
    set-sized), and only the witness agg + final agg shuffle — a
    regression here means the postings join started moving the corpus."""
    from xeloader_spark.plans.inspect import physical_plan
    from xeloader_spark.queries.text import q_phrase_search

    df = q_phrase_search(spark, "/root/testdata/sf0.001")
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert count_exchanges(df) <= 2, plan


def test_phrase_match_duplicate_phrase_rows_deduped(spark):
    """r9 review: a duplicated phrase row doubled every offset witness,
    making half-matches pass (count = n_terms) and true matches fail
    (count = 2·n_terms)."""
    from xeloader_spark.operators.phrase import phrase_match

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a x")], "doc_id long, text string"
    )
    pdf = spark.createDataFrame([("a b",), ("a b",)], "phrase string")
    got = {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in phrase_match(docs, pdf).collect()
    }
    assert got == {("a b", 1): (0, 1)}


def test_literal_form_backslash_and_nbsp_parity(spark):
    """r9 review: the literal form's SQL embedding ate backslashes, and
    Python .split() tokenized unicode whitespace Java \\s+ does not —
    both silently broke literal↔index parity."""
    from xeloader_spark.operators.phrase import phrase_match
    from xeloader_spark.streaming.phrase_stream import match_phrases

    docs = spark.createDataFrame(
        [(1, "foo\\bar baz"), (2, "a b c")],
        "doc_id long, text string",
    )
    phrases = ["foo\\bar baz", "a b", "a b c"]
    pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    via_index = {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in phrase_match(docs, pdf).collect()
    }
    via_literal = {
        (r.phrase, r.doc_id): (r.first_idx, r.n_matches)
        for r in match_phrases(docs, phrases).collect()
    }
    assert via_index == via_literal
    assert ("foo\\bar baz", 1) in via_index


def test_match_phrases_empty_list_matches_index_form(spark):
    """r9 review: array() of zero structs was an AnalysisException; the
    index form returns an empty frame and the twin must too."""
    from xeloader_spark.streaming.phrase_stream import match_phrases

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = match_phrases(docs, [])
    assert out.columns == ["doc_id", "phrase", "first_idx", "n_matches"]
    assert out.count() == 0
