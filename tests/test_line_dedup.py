"""Operator pins for corpus-wide line dedup (`operators/dedup.line_dedup`):
first-occurrence ordering, trim/empty-line handling, full-dup collapse.
Cross-engine parity for q_line_dedup lives in the oracle sweep."""

from __future__ import annotations

from xeloader_spark.operators.dedup import line_dedup

DOCS = [
    (1, "footer line\nunique one\n\n  footer line  "),
    (2, "footer line\nunique two"),
    (3, "footer line"),  # everything it has is a dup
    (4, "   \n  \n"),  # whitespace-only: no row at all
    (5, "unique one"),  # dup of doc 1's content line
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
        for r in line_dedup(df).collect()
    }


def test_first_occurrence_survives_and_later_copies_drop(spark):
    out = _run(spark)
    # doc 1: first 'footer line' kept, its own SECOND trimmed copy drops
    # (same doc, later position), empty line never counted
    assert out[1] == ("footer line\nunique one", 3, 2)
    assert out[2] == ("unique two", 2, 1)
    # all lines were dups → present with empty clean_text
    assert out[3] == ("", 1, 0)
    assert out[5] == ("", 1, 0)


def test_whitespace_only_doc_produces_no_row(spark):
    assert 4 not in _run(spark)


def test_line_sep_regex_metachar_is_literal(spark):
    """r9 review: line_sep='|' reached split() unquoted and shredded
    every character via the empty-alternation regex."""
    df = spark.createDataFrame(
        [(1, "abc|def"), (2, "abc|xyz")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
        for r in line_dedup(df, line_sep="|").collect()
    }
    assert out[1] == ("abc\ndef", 2, 2)
    assert out[2] == ("xyz", 2, 1)  # 'abc' deduped against doc 1
