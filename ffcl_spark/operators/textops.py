"""Text-analysis operators over a (id, text) document table.

Training-data-pipeline extensions (task brief): token counting,
quality scoring, language ID, document fingerprinting — plus the
round-5 family: within-document repetition metrics (Gopher rules),
the rule-based admission gate (``quality_filter``), corpus
composition ROLLUP reports (``corpus_stats``), and model-based
filtering via unigram-LM perplexity (``lm_perplexity``). The per-doc
signal operators are pure column expressions — WholeStageCodegen end
to end, no shuffle except where an aggregation is the point.
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


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Within-document repetition quality signals, the Gopher-rule
    family (Rae et al. 2021, table A1) adapted to token windows:

    - ``dup_token_frac`` — fraction of tokens that are repeats of an
      earlier token (1 − distinct/total);
    - ``top_gram``/``top_gram_count``/``top_gram_frac`` — the most
      frequent ``top_n``-gram and the fraction of the document's
      characters its occurrences cover (count × gram length /
      n_chars); ties break to the lexicographically greatest gram;
    - ``dup_span_frac`` — the fraction of token POSITIONS covered by
      some ``dup_n``-gram that occurs ≥ 2 times in the document
      (exact coverage, overlaps counted once — bounded ≤ 1, unlike
      the count×len approximation).

    Complement of ``dedup.duplicate_ngram_spans``: that one finds
    spans repeated ACROSS documents; this scores repetition WITHIN a
    document — the "remove boilerplate-y, looping text" filter of a
    training-data pipeline.

    Plan shape: per-doc scalars are one codegen scan, no shuffle; the
    top-gram branch is one (doc, gram) partial-agg + a per-doc top-1
    window; coverage is a candidate-restricted self-join on narrow
    (doc, pos, gram) triples — grams with count < 2 never join. All
    ratios are single int/int → double divisions (bit-exact
    cross-engine); no Python rows anywhere.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    toks = X.tokens(t)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars"),
        toks.alias("toks"),
    ).withColumn("n_tokens", F.size("toks"))

    scal = base.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        (
            (F.col("n_tokens") - F.size(F.array_distinct("toks"))).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("dup_token_frac"),
    )

    def grams(n: int) -> DataFrame:
        return base.select(
            "doc_id",
            "n_chars",
            F.posexplode(X.pos_ngrams(F.col("toks"), n)).alias("pos", "gram"),
        )

    top = (
        grams(top_n)
        .groupBy("doc_id", "n_chars", "gram")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("c"), F.desc("gram"))
            ),
        )
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_gram"),
            F.col("c").cast("int").alias("top_gram_count"),
            (
                (F.col("c") * F.length("gram")).cast("double")
                / F.col("n_chars").cast("double")
            ).alias("top_gram_frac"),
        )
    )

    gd = grams(dup_n)
    dup_grams = (
        gd.groupBy("doc_id", "gram").agg(F.count("*").alias("c")).where(F.col("c") >= 2)
    )
    covered = (
        gd.join(dup_grams.select("doc_id", "gram"), ["doc_id", "gram"])
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (dup_n - 1))).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("covered"))
    )

    return (
        scal.join(top, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            F.coalesce(F.col("top_gram"), F.lit("")).alias("top_gram"),
            F.coalesce(F.col("top_gram_count"), F.lit(0)).cast("int").alias(
                "top_gram_count"
            ),
            F.coalesce(F.col("top_gram_frac"), F.lit(0.0)).alias("top_gram_frac"),
            (
                F.coalesce(F.col("covered"), F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_span_frac"),
        )
    )


def corpus_stats(
    df: DataFrame,
    by: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition report: per (…``by`` rollup) group — doc
    count, token/char totals, and mean doc length — with subtotal and
    grand-total rows (``ROLLUP``; grouping columns are NULL on the
    rolled-up levels, ``level`` counts the active keys). The
    mixture-planning summary of a training-data pipeline (what feeds
    ``sampling.mixture_weights``).

    One corpus scan, one partial-agg shuffle of |groups| rows —
    Spark's rollup computes all levels from the same partial
    aggregates. Totals are exact integers; the mean is a single
    int/int double division (bit-exact cross-engine)."""
    toks = X.tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    return (
        df.select(*by, F.length(F.col(text_col)).cast("long").alias("nc"), n_tok.alias("nt"))
        .rollup(*by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("nc").alias("n_chars"),
            (F.sum("nc").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_chars"
            ),
            (
                F.lit(len(by)) - sum(F.grouping(c).cast("int") for c in by)
            ).cast("int").alias("level"),
        )
    )


# rule key → (metric column, keep-if comparator)
_QUALITY_RULES = {
    "min_tokens": ("n_tokens", "ge"),
    "max_tokens": ("n_tokens", "le"),
    "max_dup_token_frac": ("dup_token_frac", "le"),
    "max_top_gram_frac": ("top_gram_frac", "le"),
    "max_dup_span_frac": ("dup_span_frac", "le"),
}


def quality_filter(
    df: DataFrame,
    rules: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep only documents passing the length/repetition quality
    rules (``_QUALITY_RULES`` keys — thresholds over
    :func:`repetition_metrics` columns; unknown keys raise). The
    document-level "remove boilerplate / looping / degenerate text"
    admission gate of a training-data pipeline. Returns ``df`` rows
    (all columns) whose doc passes every rule; plan = the metrics
    pass + one semi-join back on the id."""
    unknown = set(rules) - set(_QUALITY_RULES)
    if unknown:
        raise ValueError(f"unknown quality rules: {sorted(unknown)}")
    m = repetition_metrics(df, id_col, text_col)
    cond = F.lit(True)
    for key, val in rules.items():
        col, op = _QUALITY_RULES[key]
        cond = cond & (
            F.col(col) >= F.lit(val) if op == "ge" else F.col(col) <= F.lit(val)
        )
    passing = m.where(cond).select(F.col("doc_id").alias(id_col))
    return df.join(passing, id_col, "left_semi")


def unigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, cnt): corpus unigram counts — the model table of the
    perplexity filter. One explode + partial-agg scan; vocabulary-
    sized output (broadcastable for any real vocabulary)."""
    return (
        df.select(F.explode(X.tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lm_perplexity(
    df: DataFrame,
    lm: DataFrame | None = None,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document perplexity under an add-``alpha``-smoothed unigram
    LM — the distilled form of model-based quality filtering (KenLM-
    style perplexity gates): degenerate/boilerplate text scores LOW
    (its tokens are corpus-frequent), lorem-ipsum-ish or wrong-language
    text scores HIGH. Output: (doc_id, n_tokens, sum_logprob_fp, ppl)
    where ``ppl = exp(−Σ ln p(t) / n)``.

    ``lm`` — a (term, cnt) table from :func:`unigram_lm` (defaults to
    fitting on ``df`` itself; pass a held-out model to avoid scoring a
    corpus under its own counts). Out-of-vocabulary tokens get the
    smoothed floor ``alpha / (T + alpha·(V+1))``.

    Determinism: each token's log-prob is rounded to a 1e-6
    fixed-point BIGINT before the per-doc sum, so the sum is exact
    integer arithmetic (order-free at any parallelism — the BM25
    fixed-point discipline applied per-term instead of per-result);
    ``ppl`` is one expression over the exact sum.

    Plan: model fit is one scan + vocabulary-sized agg; scoring is one
    explode + a broadcast-sized term join + per-doc partial agg.
    """
    if lm is None:
        lm = unigram_lm(df, id_col, text_col)
    totals = lm.agg(
        F.sum("cnt").alias("T"), F.count(F.lit(1)).alias("V")
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(X.tokens(F.col(text_col))).alias("term"),
    )
    # OOV floor: cnt 0; V+1 reserves one slot for the unseen event
    p = (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha)) / (
        F.col("T").cast("double") + F.lit(alpha) * (F.col("V").cast("double") + 1.0)
    )
    lp_fp = F.round(F.log(p) * F.lit(1000000.0)).cast("long")
    return (
        toks.join(F.broadcast(lm), "term", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(lp_fp).alias("sum_logprob_fp"),
        )
        .withColumn(
            "ppl",
            F.exp(
                -(F.col("sum_logprob_fp").cast("double") / F.lit(1000000.0))
                / F.col("n_tokens").cast("double")
            ),
        )
    )
