"""Text-analysis scalar functions (north-star text ops): heuristic
language ID, token counting, BPE-ish segmentation, rolling-hash
fingerprint. All JVM-side column expressions — no Python UDFs.

The language classifier is a stopword-profile scorer plus a CJK
character gate: the standard cheap n-gram-free heuristic. On the
driver's synthetic `documents` fixture (same vocabulary for every
`lang` label) it has no signal by construction — golden tests use real
multilingual snippets (`tests/test_text_functions.py`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# compact stopword profiles — top function words per language
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "are", "was", "with", "that"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "son"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "dem"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "une", "des", "avec"),
}

_CJK = r"[一-鿿]"


def _lower_tokens(col: str) -> Column:
    return F.split(F.lower(F.col(col)), r"[^\p{L}\p{N}]+")


def lang_id(col: str = "text") -> Column:
    """Best-scoring stopword profile; 'zh' when CJK characters dominate;
    'und' (undetermined) when nothing matches. One pass of array
    intersections over the token set — codegen-friendly."""
    toks = F.array_distinct(_lower_tokens(col))
    cjk_chars = F.length(F.regexp_replace(F.col(col), f"(?!{_CJK}).", ""))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }
    best_lang, best_score = None, None
    for lang, score in sorted(scores.items()):
        if best_lang is None:
            best_lang, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, score).otherwise(best_score)
    return (
        F.when(cjk_chars * 5 >= F.length(F.col(col)), F.lit("zh"))
        .when(best_score > 0, best_lang)
        .otherwise(F.lit("und"))
    )


def token_count(col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.col(col), r"\s+"))


def subword_count(col: str = "text") -> Column:
    """BPE-ish token estimate: splits on whitespace, punctuation
    boundaries, and letter/digit transitions — the cheap proxy for a
    real tokenizer's piece count (regex only, no vocab)."""
    pieces = F.regexp_replace(
        F.col(col), r"(\p{L})(\p{N})|(\p{N})(\p{L})", r"$1$3 $2$4"
    )
    pieces = F.regexp_replace(pieces, r"([\p{L}\p{N}])([^\p{L}\p{N}\s])", r"$1 $2")
    return F.size(F.split(pieces, r"\s+"))


def rolling_fingerprint(col: str = "text", window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min md5 over word
    ``window``-grams — robust to local edits, unlike whole-doc md5."""
    toks = F.split(F.col(col), " ")
    n = F.size(toks)
    idx = F.when(
        n >= window, F.sequence(F.lit(1), n - (window - 1))
    ).otherwise(F.sequence(F.lit(1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))))
    return F.array_min(grams)
