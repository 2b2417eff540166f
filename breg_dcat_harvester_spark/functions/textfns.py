"""Text-analysis column functions for the documents pipeline.

All pure Column expressions (whole-stage codegen; SQL-oracle-able):

* ``token_stats``     — whitespace token count + BPE-ish piece count
  (regex [a-z]+ | digits | other-symbol).
* ``language_id``     — stopword-hit heuristic over small per-language
  profiles; returns argmax language with deterministic tie-break.
* ``quality_features``— length/char-class/stopword features for corpus
  quality scoring (exact integer numerators; ratios left to the caller to
  avoid cross-engine float drift).
* ``fingerprint``     — winnowing-style document fingerprint: the minimum
  sha256 prefix over all k-char grams (content-deterministic; robust to
  reordering-free small edits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PIECE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "por", "los"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est", "pour", "les"],
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def token_stats(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    pieces = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PIECE_RE), F.lit(0))
    return {
        "n_tokens": F.size(toks).cast("long"),
        "n_pieces": F.size(pieces).cast("long"),
        "n_chars": F.length(text).cast("long"),
    }


def stopword_hits(text: Column, lang: str) -> Column:
    toks = tokens(text)
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def language_id(text: Column) -> Column:
    """argmax stopword hits; ties broken by language-code order (en<es<fr)."""
    hits = [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]
    best_lang = F.lit("und")
    best_hits = F.lit(-1).cast("long")
    for lang, h in hits:
        is_better = h > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, h).otherwise(best_hits)
    return F.when(best_hits > 0, best_lang).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    stats = token_stats(text)
    return {
        **stats,
        "n_alpha": F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("long"),
        "n_digit": F.length(F.regexp_replace(text, "[^0-9]", "")).cast("long"),
        "n_punct": F.length(F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("long"),
        "n_stopword_en": stopword_hits(text, "en"),
    }


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1.2): duplicate-line and most-common-
    bigram numerators, the standard filters for boilerplate / degenerate
    generations in training-corpus curation.

    Exact integer numerators only (ratios left to the caller — same
    convention as ``quality_features``), all pure Column expressions:
    map-side, whole-stage codegen, zero shuffle, SQL-oracle-able.
    The per-row bigram count is O(tokens x distinct bigrams) in the worst
    case but runs inside the row (no explode/groupBy state); for the
    typical document sizes corpus filters see, that beats shuffling
    |tokens| rows per document by far.
    """
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    toks = tokens(text)
    empty = F.slice(toks, 1, 0)  # typed empty array<string>
    # guard: Spark's sequence(1, size-1) DESCENDS when size < 2
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(empty)
    max_bigram = F.when(
        F.size(bigrams) > 0,
        F.array_max(
            F.transform(
                F.array_distinct(bigrams),
                lambda d: F.size(F.filter(bigrams, lambda x: x == d)),
            )
        ),
    ).otherwise(F.lit(0))
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_distinct_lines": F.size(F.array_distinct(lines)).cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "n_bigrams": F.size(bigrams).cast("long"),
        "max_bigram_count": max_bigram.cast("long"),
    }


def fingerprint(text: Column, k: int = 8, prefix_len: int = 16) -> Column:
    """min over k-gram sha256 prefixes — a winnowing-lite rolling fingerprint."""
    lower = F.lower(text)
    grams = F.when(
        F.length(lower) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(lower) - (k - 1)),
            lambda i: F.substr(lower, i, F.lit(k)),
        ),
    ).otherwise(F.array(lower))
    hashed = F.transform(grams, lambda g: F.substring(F.sha2(g, 256), 1, prefix_len))
    return F.array_min(hashed)
