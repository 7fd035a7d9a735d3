"""Text-analysis operators over a (id, text) document table.

Training-data-pipeline extensions (task brief): token counting,
quality scoring, language ID, document fingerprinting. All pure column
expressions — WholeStageCodegen end to end, no shuffle except where an
aggregation is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.functions import text as X


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = X.tokens(F.col(text_col))
    return df.select(
        F.col(id_col), F.size(toks).alias("n_tokens")
    )


# BPE-ish subword segmentation proxy: letter runs, single digits, and
# single non-alphanumeric glyphs — the standard pre-tokenization shape
# of GPT-2-style BPE vocabularies (a letter run ≈ one-or-few merges, a
# digit is never merged, punctuation stands alone). Pure character
# classes so Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, n_bpe): whitespace tokens plus the BPE-ish
    subword count — the training-data-pipeline cost estimator (brief:
    'token counting: whitespace + a BPE-ish regex'). One regexp_count
    expression — codegen, no shuffle."""
    toks = X.tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("int").alias("n_bpe"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword / punctuation quality features. Ratios are a
    single int/int double division (bit-exact cross-engine)."""
    t = F.col(text_col)
    toks = X.tokens(t)
    n_tok = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, s: a + F.length(s))
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        (sum_len.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
        (X.stopword_count(toks).cast("double") / n_tok.cast("double")).alias(
            "stopword_ratio"
        ),
        (X.punct_count(t).cast("double") / F.length(t).cast("double")).alias(
            "punct_ratio"
        ),
    )


def text_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All five per-document text signals — token count, BPE-ish
    subword count, quality features, language ID, rolling
    fingerprint — in ONE projection over one scan of the corpus.

    At 100 TB this is the plan you want: the five standalone operators
    each re-scan ``text``; a training-data pipeline computing all of
    them (the common case — filter on quality, bucket by lang, cost by
    tokens, dedup by fingerprint) should pay for tokenization once.
    Still a single WholeStageCodegen Project, no shuffle, no Python."""
    t = F.col(text_col)
    toks = X.tokens(t)
    n_tok = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, s: a + F.length(s))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.regexp_count(t, F.lit(BPE_PATTERN)).cast("int").alias("n_bpe"),
        F.length(t).alias("n_chars"),
        (sum_len.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
        (X.stopword_count(toks).cast("double") / n_tok.cast("double")).alias(
            "stopword_ratio"
        ),
        (X.punct_count(t).cast("double") / F.length(t).cast("double")).alias(
            "punct_ratio"
        ),
        X.lang_id(toks).alias("lang_pred"),
        X.rolling_fingerprint(toks).alias("fingerprint"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = X.tokens(F.col(text_col))
    return df.select(F.col(id_col), X.lang_id(toks).alias("lang_pred"))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = X.tokens(F.col(text_col))
    return df.select(F.col(id_col), X.rolling_fingerprint(toks).alias("fingerprint"))


def edit_distance_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, edit_dist): exact Levenshtein distance between the
    texts of SimHash near-dup candidate pairs — reference
    ``Distances.hpp:195-237`` (classic two-row DP edit distance), run
    as the verification stage of a banded blocking plan.

    Scale shape: the quadratic edit-distance DP runs ONLY on pairs the
    SimHash banding proposes (hamming ≤ ``max_hamming``), never
    all-pairs; ``F.levenshtein`` is a JVM built-in, so the hot path
    stays codegen — no Python per row."""
    from ffcl_spark.operators.dedup import simhash_neardup_pairs

    pairs = simhash_neardup_pairs(df, max_hamming, id_col, text_col)
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            F.levenshtein(F.col("text_a"), F.col("text_b")).cast("int").alias("edit_dist"),
        )
    )
