"""Text-analysis column expressions for the training-data pipeline:
tokenization, quality metrics, fingerprints, shingles. All JVM builtins —
these run over billions of documents, so no Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# A tiny fixed multilingual stopword table (heuristic quality scoring /
# language-ID; deliberately deterministic and engine-portable).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "y", "es", "un"],
    "fr": ["le", "la", "de", "et", "est", "un"],
}


def normalize_ws(text: Column) -> Column:
    """Collapse whitespace runs + trim + lowercase (doc canonical form)."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def tokens(text: Column) -> Column:
    """Whitespace tokenization -> array<string> (empty string -> empty array)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Share of tokens that are stopwords for ``lang``."""
    toks = tokens(normalize_ws(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def fingerprint(text: Column) -> Column:
    """Normalized md5 fingerprint — exact-dedup key
    (rolling-hash analog of document fingerprinting)."""
    return F.md5(normalize_ws(text))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a token array (MinHash/Jaccard input).

    transform(sequence(...)) keeps this in codegen; array_distinct dedups.
    NB Spark's sequence(0, -1) yields a DESCENDING sequence, so short docs
    must be guarded explicitly rather than relying on an empty range.
    """
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
        )
    )
    return F.array_distinct(grams)
