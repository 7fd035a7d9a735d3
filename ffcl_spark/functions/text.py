"""Text-analysis column expressions — all JVM-side (no Python UDFs).

Cross-engine determinism rule: every hash used in an oracle-checked
output is built from md5 (available and identical in Spark and DuckDB)
and pure int64 arithmetic, so a SQL oracle reproduces values exactly:

    tok_hash32(t) = int(md5(t)[:8 hex], 16)        ∈ [0, 2^32)

The reference has no string functions beyond Levenshtein
(``Distances.hpp:195-237`` — Spark built-in ``F.levenshtein``); these
operators are the training-data-pipeline extensions (task brief).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_PRIME = 2147483647  # 2^31 - 1
ROLL_MUL = 31

# deterministic stopword / language-marker sets (fixed, versioned)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "les", "des", "et", "une"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (same list in DuckDB:
    list_filter(string_split(text, ' '), t -> t <> ''))."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def tok_hash32(t: Column) -> Column:
    """md5-derived 32-bit token hash, identical in any SQL engine."""
    return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")


def rolling_fingerprint(toks: Column) -> Column:
    """Order-sensitive document fingerprint: left fold
    h = (h*31 + tok_hash32) mod (2^31-1) — the rolling-hash
    fingerprint of the task brief. Pure integer fold → exact."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * ROLL_MUL + tok_hash32(t)) % HASH_PRIME,
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram token shingles (space-joined).

    Docs with fewer than ``n`` tokens yield an EMPTY array — guarded
    explicitly, because ``sequence(1, size-(n-1))`` would otherwise
    produce the descending sequence [1, 0] and ``element_at(toks, 0)``
    throws. Matches the DuckDB oracle, where
    ``generate_series(1, -1)`` is empty.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def pos_ngrams(toks: Column, n: int) -> Column:
    """ALL n-gram token windows in document order (space-joined,
    duplicates kept — unlike ``shingles``, which is the distinct set).
    Array position j is the window starting at token j, so a
    ``posexplode`` yields exact token coverage spans. Same short-doc
    guard as ``shingles``."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_count(toks: Column) -> Column:
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(toks: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(toks: Column) -> Column:
    """Marker-count argmax with lexicographic tie-break — a toy n-gram
    language-ID heuristic, deterministic and SQL-reproducible."""
    scores = lang_scores(toks)
    # struct-max trick: max(struct(score, neg-lex lang)) — to get the
    # lexicographically smallest lang on tie, order langs descending
    # and rely on greatest picking the last max… simpler: fold CASE.
    best = None
    for lang in sorted(scores, reverse=True):  # later = earlier alphabet wins ties
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(s >= best["s"], F.struct(s.alias("s"), F.lit(lang).alias("l"))).otherwise(best)
    return best["l"]


def punct_count(text: Column) -> Column:
    """Characters that are not [a-zA-Z0-9 ]."""
    return F.length(text) - F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
