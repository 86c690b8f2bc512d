"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's per-document transform surface (SURVEY.md §2.8)
with the operations a web-scale corpus pipeline needs: language-ID, quality
scoring, token counting, and document fingerprinting. Everything here is a
JVM-side column expression (whole-stage codegen, no Python in the hot path);
each has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so DuckDB
can verify it.

Determinism notes: float scores are returned as integer micro-units
(``*1e6`` rounded) so cross-engine value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists (public knowledge); enough for an n-gram /
# stopword-hit heuristic over the synthetic corpus
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "vi": ["và", "của", "là", "cho", "các"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count(col: str = "text") -> Column:
    """Whitespace token count. SQL twin: len(regexp_split_to_array(trim(x),'\\s+'))."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+")).alias("token_count")


def word_hits(col: str, word: str) -> Column:
    """Count of whole-word occurrences (word-boundary regex)."""
    return F.regexp_count(F.col(col), F.lit(rf"\b{word}\b"))


def lang_scores(col: str = "text") -> list[Column]:
    """Per-language stopword-hit scores."""
    return [
        sum(word_hits(col, w) for w in words).alias(f"score_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]


def quality_score_micro(col: str = "text") -> Column:
    """Heuristic quality score in integer micro-units.

    score = 0.4*alpha_ratio + 0.3*min(1, tokens/100) + 0.3*(1 - punct_ratio),
    with alpha_ratio = alphabetic chars / chars, punct_ratio = punct / chars.
    All components are exact integer/decimal arithmetic until the final
    rounding, so the DuckDB twin matches bit-for-bit.
    """
    n = F.length(F.col(col)).cast("double")
    alpha = F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(F.col(col), r"[^.,;:!?]", "")).cast("double")
    toks = F.size(F.split(F.trim(F.col(col)), r"\s+")).cast("double")
    score = (
        F.lit(0.4) * (alpha / n)
        + F.lit(0.3) * F.least(F.lit(1.0), toks / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct / n)
    )
    return F.round(score * 1_000_000).cast("bigint").alias("quality_micro")


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of lower-cased, whitespace-collapsed text —
    the normalization-robust twin of the reference's raw content hash
    (incremental_pinecone_updater.py:139-141)."""
    return F.md5(F.encode(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), "utf-8")).alias(
        "fingerprint"
    )
