"""Stream-side phrase matching — the stateless twin of
`operators/phrase.phrase_match`.

The batch operator is the INDEX form: postings built once, phrases as
data, equi-joins — right when the phrase set scales with the workload.
A stream scoring arriving documents against a deployment's phrase set
(brand-safety terms, contamination canaries, quote watchlists) wants
the LITERAL form instead: phrases frozen into the plan, each document
matched by per-row array HOFs over its own token array — zero joins,
zero aggregates, ZERO streaming state (one row in → ≤|phrases| rows
out). The same literal-vs-data split as `operators/robots.py`
(robots_filter vs robots_filter_table); both forms are pinned
row-identical in tests/test_streaming.py.

Matching semantics are the positional contract of the index operator:
a start s matches when the document's token slice [s, s+n) equals the
phrase's token array, overlapping occurrences counted separately,
first_idx 0-based."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.phrase import TOKENS_SPARK

# Java's \s — ASCII-only, unlike Python's unicode-aware \s. The phrase
# must be tokenized with the SAME whitespace class the documents are
# (TOKENS_SPARK splits with Java \s+), or a unicode-space phrase would
# silently diverge between the literal and index forms (r9 review).
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _sql_str(s: str) -> str:
    """Escape for a Spark SQL single-quoted literal: backslashes FIRST
    (Spark literals process C escapes — an unescaped backslash in a
    phrase silently changed the literal form's tokens, r9 review),
    then quotes."""
    return s.replace("\\", "\\\\").replace("'", "''")


def _lit_arr(tokens: list[str]) -> str:
    items = ", ".join("'" + _sql_str(t) + "'" for t in tokens)
    return f"array({items})"


def phrase_hits_sql(phrase: str, toks_sql: str) -> str:
    """Per-row occurrence struct for ONE phrase over a token-array
    column: named_struct(phrase, first_idx, n_matches). The start list
    is a filter over sequence(0, size-n) — the guarded upper bound
    (greatest(…, 0) + an in-lambda length check) keeps the sequence
    ascending and the result a typed empty array when the document is
    shorter than the phrase."""
    toks = [t for t in _JAVA_WS.split(phrase.lower()) if t]
    if not toks:
        raise ValueError("phrase must contain at least one token")
    n = len(toks)
    starts = (
        f"filter(sequence(0, greatest(size({toks_sql}) - {n}, 0)), "
        f"s -> s + {n} <= size({toks_sql}) "
        f"AND slice({toks_sql}, s + 1, {n}) = {_lit_arr(toks)})"
    )
    ph = "'" + _sql_str(phrase) + "'"
    return (
        f"named_struct('phrase', {ph}, "
        f"'first_idx', CAST(try_element_at({starts}, 1) AS BIGINT), "
        f"'n_matches', CAST(size({starts}) AS BIGINT))"
    )


def match_phrases(
    df: DataFrame, phrases: list[str], text_col: str = "text"
) -> DataFrame:
    """Long-form phrase hits for a LITERAL phrase list, as one stateless
    projection (batch and stream alike — no join, no aggregate, no
    state): tokenize once, evaluate every phrase's occurrence struct,
    explode, keep hits. Columns: input columns (minus text) + (phrase,
    first_idx, n_matches) — the schema of the index operator's output,
    so the two forms compare row-for-row."""
    if not phrases:
        # the index form returns an empty frame for an empty phrase
        # table; the literal form must match (an untyped array() of
        # zero structs is an AnalysisException, r9 review)
        return df.select(
            *[c for c in df.columns if c != text_col],
            F.lit(None).cast("string").alias("phrase"),
            F.lit(None).cast("long").alias("first_idx"),
            F.lit(None).cast("long").alias("n_matches"),
        ).filter(F.lit(False))
    structs = ", ".join(
        phrase_hits_sql(p, "_toks") for p in dict.fromkeys(phrases)
    )
    return (
        df.withColumn("_toks", F.expr(TOKENS_SPARK.format(c=text_col)))
        .select(
            "*",
            F.explode(F.expr(f"array({structs})")).alias("_h"),
        )
        .filter(F.col("_h.n_matches") > 0)
        .select(
            *[c for c in df.columns if c != text_col],
            F.col("_h.phrase").alias("phrase"),
            F.col("_h.first_idx").alias("first_idx"),
            F.col("_h.n_matches").alias("n_matches"),
        )
    )
