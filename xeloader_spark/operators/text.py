"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is built-in column expressions (JVM, whole-stage codegen) and
single-pass per document — no shuffles at all except where an aggregate is
requested; ratios stay bigint/bigint → double so results are
engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram-free heuristic language ID.
# Deliberately tiny: language ID here is a deterministic scoring operator,
# not a model; swap the marker table for a real lexicon in production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
}

STOPWORDS_EN = LANG_MARKERS["en"]

# BPE-ish word-piece pattern: letter runs, digit runs, or single
# non-space symbols — the shape (not the vocab) of byte-pair tokenizers.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tok_array(text_col: str) -> str:
    return f"filter(split({text_col}, '\\\\s+'), x -> x != '')"


def marker_count(text_col: str, markers: tuple[str, ...]) -> Column:
    """Count tokens that are marker words — via array intersection size,
    not regex (regex word-boundary semantics differ across engines)."""
    toks = _tok_array(text_col)
    quoted = ",".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter({toks}, x -> array_contains(array({quoted}), x)))"
    ).cast("long")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score each language by marker-token count,
    argmax with deterministic tie-break (score desc, language name asc);
    'und' when nothing matches."""
    scored = df
    for lang, markers in LANG_MARKERS.items():
        scored = scored.withColumn(f"score_{lang}", marker_count(text_col, markers))
    best = None
    for lang in sorted(LANG_MARKERS):
        cand = F.struct(
            F.col(f"score_{lang}").alias("score"),
            F.lit(lang).alias("lang"),
        )
        best = cand if best is None else F.when(
            (cand["score"] > best["score"]), cand
        ).otherwise(best)
    return scored.withColumn(
        "lang_guess",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics: char/token counts, mean token
    length, punctuation/digit/stopword ratios, whitespace + BPE-ish token
    counts."""
    toks = _tok_array(text_col)
    n_chars = F.length(text_col).cast("long")
    n_tokens = F.expr(f"size({toks})").cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text_col, r"[^A-Za-z0-9\s]", ""))
    ).cast("long")
    n_digit = (
        n_chars - F.length(F.regexp_replace(text_col, r"[0-9]", ""))
    ).cast("long")
    n_stop = marker_count(text_col, STOPWORDS_EN)
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE)).cast("long")
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("punct_ratio", n_punct / n_chars)
        .withColumn("digit_ratio", n_digit / n_chars)
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn("n_bpe_tokens", n_bpe)
    )


def quality_flag(
    df: DataFrame,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """Boolean keep/drop decision from the stats — the filter stage of a
    data-cleaning pipeline."""
    need = {"n_tokens", "punct_ratio"}
    if not need.issubset(set(df.columns)):
        df = text_stats(df)
    return df.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= min_tokens) & (F.col("punct_ratio") <= max_punct_ratio),
    )


def repetition_stats(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Intra-document repetition: total vs distinct word n-grams and the
    repeated fraction (1 - distinct/total) — the boilerplate/spam signal
    quality filters key on. Entirely array-side (one narrow projection,
    no explode, no shuffle); the token array is materialized once so the
    interpreted higher-order functions don't re-split the text."""
    toks = _tok_array(text_col)
    sh = (
        f"CASE WHEN size(_toks) < {n} THEN array() "
        f"ELSE transform(sequence(0, size(_toks) - {n}), "
        f"i -> array_join(slice(_toks, i + 1, {n}), ' ')) END"
    )
    return (
        df.withColumn("_toks", F.expr(toks))
        .withColumn("_sh", F.expr(sh))
        .withColumn("n_ngrams", F.expr("size(_sh)").cast("long"))
        .withColumn("n_distinct_ngrams", F.expr("size(array_distinct(_sh))").cast("long"))
        .withColumn(
            "rep_ratio",
            F.when(
                F.col("n_ngrams") > 0,
                (F.col("n_ngrams") - F.col("n_distinct_ngrams")) / F.col("n_ngrams"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_toks", "_sh")
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whole-document fingerprint: md5 over the normalized text (lowercase,
    whitespace collapsed) — the exact-dedup key that survives formatting
    noise."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def rolling_fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Winnowing-style content fingerprint: the minimum shingle hash over
    word n-grams — stable under local edits, usable as a near-dup
    pre-cluster key. Array-side, no explode."""
    toks = _tok_array(text_col)
    sh = (
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {n}), "
        f"i -> md5(array_join(slice({toks}, i + 1, {n}), ' '))) END"
    )
    return df.withColumn("rolling_fp", F.expr(f"array_min({sh})"))
