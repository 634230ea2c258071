"""Text-analysis column expressions (training-data pipeline surface).

Language-ID (marker-word heuristic), quality scoring, token counting,
and document fingerprinting — all as native Column expressions (no
UDFs, SURVEY §2.10 design rule), so they stay inside whole-stage
codegen and scale linearly over a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count_col",
    "quality_cols",
    "lang_guess_col",
    "doc_fingerprint_cols",
]

#: Marker stopwords per language for the n-gram/marker heuristic.
#: Deliberately tiny — the point is the operator shape (vectorized
#: per-language scoring + argmax), not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count (runs of non-whitespace)."""
    return F.regexp_count(text, F.lit(r"\S+")).cast("long")


#: GPT-2-style pre-tokenizer classes — contraction suffixes, letter
#: runs, digit runs, symbol runs — without the lookaheads of the real
#: BPE pattern so the SAME regex runs under Java (Spark) and RE2
#: (DuckDB oracle). Counts approximate LLM token budgets ~1:1 on
#: prose, which is what a pipeline's cost accounting needs.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish subword-class token count (see BPE_TOKEN_PATTERN)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def _marker_count(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat)).cast("long")


def lang_guess_col(text: Column) -> Column:
    """Argmax over per-language marker-word counts; ties break in
    LANG_MARKERS declaration order; all-zero → 'unknown'."""
    counts = {lang: _marker_count(text, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("unknown")
    # Build WHEN chain in reverse so earlier languages win ties.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_cols(text: Column) -> dict[str, Column]:
    """Length/punctuation/stopword quality signals + composite score."""
    n_chars = F.length(text).cast("long")
    n_tokens = token_count_col(text)
    n_stop = _marker_count(text, STOPWORDS)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("long")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    score = F.round(
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2,
        6,
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "n_punct": n_punct,
        "stop_ratio": F.round(stop_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": score,
    }


def doc_fingerprint_cols(text: Column) -> dict[str, Column]:
    """Content fingerprints: sha256/md5 of the normalized text plus a
    64-bit prefix of the md5 as a numeric fingerprint (the portable
    stand-in for a rolling hash — same value computable in any engine).
    """
    norm = F.lower(F.trim(text))
    md5 = F.md5(norm)
    return {
        "sha256_hex": F.sha2(norm, 256),
        "md5_hex": md5,
        "fingerprint64": F.conv(F.substring(md5, 1, 15), 16, 10).cast("long"),
    }
