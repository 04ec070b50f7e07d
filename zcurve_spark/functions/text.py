"""Text-analysis Column expressions for training-data pipelines.

All pure built-in expressions (JVM, codegen): token counting, quality
scoring, n-gram language-ID heuristic, rolling-hash fingerprinting.
Integer outputs throughout so results are engine-independent
(oracle-checkable against DuckDB bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(text_col) -> Column:
    """Whitespace token count (split on single space, empties included —
    mirrors DuckDB string_split semantics)."""
    return F.size(F.split(_c(text_col), " ")).cast("long")


# BPE-pre-tokenizer shape: alpha runs, digit runs, single non-alnum
# marks (whitespace dropped).  Branches match disjoint character
# classes, so Java (Spark) and RE2 (DuckDB) regex engines agree on
# every input regardless of leftmost-first vs leftmost-longest.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(text_col) -> Column:
    """BPE-ish regex token count (the pre-tokenization most byte-pair
    encoders apply before merges) — JVM regexp, no Python."""
    return F.regexp_count(_c(text_col), F.lit(BPE_TOKEN_RE)).cast("long")


def occurrences(text_col, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal substring."""
    t = _c(text_col)
    return (
        (F.length(t) - F.length(F.replace(t, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def quality_score_milli(text_col, n_chars_col) -> Column:
    """Crude quality score in [0, 1000]: tokens-per-char density scaled;
    integer so it's deterministic across engines."""
    return F.floor(
        F.lit(1000.0) * token_count(text_col) / F.greatest(_c(n_chars_col), F.lit(1))
    ).cast("long")


def punct_count(text_col) -> Column:
    """Characters that are not [a-zA-Z0-9 ]."""
    t = _c(text_col)
    return F.length(F.regexp_replace(t, "[a-zA-Z0-9 ]", "")).cast("long")


# marker-token tables for the n-gram language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "es": (" el ", " los ", " una "),
    "fr": (" le ", " les ", " des "),
    "zh": ("的", "是", "在"),
}


def lang_id(text_col) -> Column:
    """Argmax of marker-token hit counts; deterministic tiebreak by the
    fixed language order (falls back to 'en' on all-zero)."""
    t = F.concat(F.lit(" "), _c(text_col), F.lit(" "))
    scores = {
        lang: sum(
            (F.length(t) - F.length(F.replace(t, F.lit(m), F.lit("")))) / F.lit(len(m))
            for m in markers
        ).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit("en")
    best_score = F.lit(-1).cast("long")
    for lang in reversed(langs):  # reversed so earlier langs win ties
        cond = scores[lang] >= best_score
        best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def fingerprint(text_col, *, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min over token-window hashes.

    Rolling scheme: hash each consecutive `window`-token shingle with
    xxhash64 and take the minimum — a stable content fingerprint that
    survives small edits outside the minimal window (public winnowing /
    MinHash idea).  Returns a non-negative long.
    """
    w = F.split(_c(text_col), " ")
    shingles = F.when(F.size(w) < window, F.array(_c(text_col))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - window),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(window)]),
        )
    )
    return F.array_min(F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit((1 << 62) - 1))))
