"""Text primitives for the LLM-data-pipeline operators (SURVEY.md §2.11).

All JVM-side column expressions (no Python UDFs) — these run inside
whole-stage codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language-ID
# operator (L-family; public-knowledge common words).
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "for", "on", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "de": ["der", "die", "das", "und", "den", "von", "zu", "mit", "sich", "auf"],
    "fr": ["le", "les", "des", "et", "un", "une", "du", "dans", "est", "pour"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
# Kept to a regex subset with identical semantics in Java and RE2.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def distinct_tokens(text: Column | str) -> Column:
    """Token *set* (order-insensitive consumers only — element order of
    array_distinct differs from DuckDB's list_distinct)."""
    return F.array_distinct(tokens(text))


def normalize_text(text: Column | str) -> Column:
    """Dedup normalization: lowercase, trim, collapse whitespace.

    Spark regexp_replace replaces all matches by default; the DuckDB
    oracle needs the explicit 'g' flag (SURVEY.md §5.3 rule 5).
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def shingles(tok_col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as space-joined strings.

    Uses try_element_at: Spark 4 runs ANSI mode by default, where
    element_at throws on out-of-bounds; try_element_at yields NULL and
    concat_ws drops NULLs (same as DuckDB list indexing + concat_ws).
    """
    name = tok_col if isinstance(tok_col, str) else None
    if name is None:
        raise ValueError("shingles() needs a column name (used inside expr)")
    parts = ", ".join(f"try_element_at({name}, i + {j})" for j in range(n))
    return F.expr(
        f"transform(sequence(1, greatest(size({name}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', {parts}))"
    )


def stopword_ratio(tok_col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    wl = STOPWORDS[lang]
    hits = F.size(F.filter(tok_col, lambda t: t.isin(*wl)))
    return hits.cast("double") / F.size(tok_col).cast("double")


def lang_scores(tok_col: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (heuristic n-gram language ID)."""
    n = F.size(tok_col).cast("double")
    return {
        lang: F.size(F.filter(tok_col, lambda t: t.isin(*wl))).cast("double") / n
        for lang, wl in STOPWORDS.items()
    }
