from ffcl_spark.functions.text import HASH_PRIME, ROLL_MUL, STOPWORDS
from ffcl_spark.operators import textops as TO


def _docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "b  c   d"),  # multiple spaces → empty tokens dropped
        (2, "hello, world! yes?"),
        (3, "der die das und nicht der"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    got = TO.token_counts(_docs(spark)).toPandas().set_index("doc_id").n_tokens
    assert got.loc[0] == 4 and got.loc[1] == 3 and got.loc[2] == 3  # b/c/d tokens


def test_quality_scores(spark):
    got = TO.quality_scores(_docs(spark)).toPandas().set_index("doc_id")
    r0 = got.loc[0]
    assert r0.n_chars == len("the quick brown fox")
    assert r0.n_tokens == 4
    assert r0.avg_token_len == (3 + 5 + 5 + 3) / 4
    assert r0.stopword_ratio == 1 / 4  # only "the"
    r2 = got.loc[2]
    assert r2.punct_ratio == 3 / len("hello, world! yes?")


def test_lang_id_markers(spark):
    got = TO.lang_id(_docs(spark)).toPandas().set_index("doc_id").lang_pred
    assert got.loc[3] == "de"
    assert got.loc[0] == "en"
    # doc 1 has zero markers anywhere → tie → lexicographically first
    assert got.loc[1] == "de"


def test_fingerprint_rolling_hash(spark):
    import hashlib

    got = TO.fingerprints(_docs(spark)).toPandas().set_index("doc_id").fingerprint

    def tok_hash(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    def roll(tokens):
        h = 0
        for t in tokens:
            h = (h * ROLL_MUL + tok_hash(t)) % HASH_PRIME
        return h

    assert got.loc[0] == roll(["the", "quick", "brown", "fox"])
    assert got.loc[1] == roll(["b", "c", "d"])


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta alpha")], "doc_id long, text string"
    )
    got = TO.fingerprints(docs).toPandas().set_index("doc_id").fingerprint
    assert got.loc[0] != got.loc[1]


def test_bpe_token_counts_matches_python_re(spark):
    import re

    from ffcl_spark.operators.textops import BPE_PATTERN, bpe_token_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = bpe_token_counts(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = pdf["text"].map(lambda t: len(re.findall(BPE_PATTERN, t or "")))
    assert (got["n_bpe"].to_numpy() == exp.to_numpy()).all()
    assert (got["n_bpe"] >= got["n_tokens"]).all()  # subwords ≥ whitespace tokens


def _rep_oracle(text, top_n=2, dup_n=3):
    """Pure-Python twin of repetition_metrics for one document."""
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    n_chars = len(text)
    dup_token_frac = (n - len(set(toks))) / n
    g = lambda w: [" ".join(toks[i : i + w]) for i in range(n - w + 1)] if n >= w else []
    from collections import Counter

    c2 = Counter(g(top_n))
    if c2:
        top = max(c2, key=lambda x: (c2[x], x))
        top_cnt, top_frac = c2[top], c2[top] * len(top) / n_chars
    else:
        top, top_cnt, top_frac = "", 0, 0.0
    g3 = g(dup_n)
    c3 = Counter(g3)
    covered = set()
    for i, gr in enumerate(g3):
        if c3[gr] >= 2:
            covered.update(range(i, i + dup_n))
    return dup_token_frac, top, top_cnt, top_frac, len(covered) / n


def test_repetition_metrics(spark):
    rows = [
        (0, "a b a b a b c"),            # heavy bigram repetition
        (1, "x y z w"),                   # no repeats at all
        (2, "p q r p q r p q r"),        # full trigram coverage
        (3, "one two"),                   # too short for trigrams
        (4, "s"),                         # single token, no bigrams
        (5, "t t t t"),                   # one distinct token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = TO.repetition_metrics(df).toPandas().set_index("doc_id").sort_index()
    assert len(got) == len(rows)
    for did, text in rows:
        dtf, top, cnt, frac, span = _rep_oracle(text)
        r = got.loc[did]
        assert r.dup_token_frac == dtf, (did, "dup_token_frac")
        assert r.top_gram == top, (did, "top_gram")
        assert r.top_gram_count == cnt, (did, "top_gram_count")
        assert r.top_gram_frac == frac, (did, "top_gram_frac")
        assert r.dup_span_frac == span, (did, "dup_span_frac")
    # the repeated-trigram doc is fully covered; the clean doc not at all
    assert got.loc[2].dup_span_frac == 1.0
    assert got.loc[1].dup_span_frac == 0.0 and got.loc[1].dup_token_frac == 0.0
    # tie-break: doc 0 bigrams "a b" (3×) beats "b a" (2×)
    assert got.loc[0].top_gram == "a b" and got.loc[0].top_gram_count == 3


def test_repetition_metrics_testdata(spark):
    """Random-document spot check against the pure-Python oracle on
    real corpus rows (long docs, realistic vocabulary)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    got = TO.repetition_metrics(df).toPandas().set_index("doc_id")
    for _, row in df.select("doc_id", "text").toPandas().iterrows():
        dtf, top, cnt, frac, span = _rep_oracle(row.text)
        r = got.loc[row.doc_id]
        assert (r.dup_token_frac, r.top_gram, r.top_gram_count) == (dtf, top, cnt)
        assert r.top_gram_frac == frac and r.dup_span_frac == span


def test_corpus_stats_rollup_vs_duckdb(spark):
    """Oracle-exact vs a DuckDB ROLLUP over the same parquet — the
    in-pytest twin of the driver gate pattern (no driver slot
    needed)."""
    import duckdb

    path = "/root/testdata/sf0.001/documents.parquet"
    got = (
        TO.corpus_stats(spark.read.parquet(path))
        .toPandas()
        .fillna({"lang": "", "source": ""})
        .sort_values(["level", "lang", "source"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(f"""
WITH tk AS (
  SELECT lang, source, CAST(length(text) AS BIGINT) AS nc,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS nt
  FROM '{path}')
SELECT lang, source, count(*) AS n_docs, sum(nt) AS n_tokens, sum(nc) AS n_chars,
       CAST(sum(nc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars,
       CAST(2 - (CASE WHEN grouping(lang) = 1 THEN 1 ELSE 0 END
               + CASE WHEN grouping(source) = 1 THEN 1 ELSE 0 END) AS INTEGER) AS level
FROM tk GROUP BY ROLLUP (lang, source)
""")
        .df()
        .fillna({"lang": "", "source": ""})
        .sort_values(["level", "lang", "source"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 1
    for c in ("lang", "source", "level"):
        assert (got[c].astype(str) == want[c].astype(str)).all(), c
    for c in ("n_docs", "n_tokens", "n_chars"):
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c
    assert (got.mean_chars == want.mean_chars).all()  # single division → bit-exact
    # grand total present exactly once and consistent
    assert (got.level == 0).sum() == 1
    tot = got[got.level == 0].iloc[0]
    leaves = got[got.level == 2]
    assert tot.n_docs == leaves.n_docs.sum() and tot.n_tokens == leaves.n_tokens.sum()


def test_quality_filter(spark):
    import pytest

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),  # clean → keep
        (1, "spam spam spam spam spam spam spam spam"),        # degenerate
        (2, "too short"),                                       # under min_tokens
        (3, "p q r p q r p q r"),                               # full trigram cover
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rules = {"min_tokens": 4, "max_dup_token_frac": 0.5, "max_dup_span_frac": 0.9}
    kept = sorted(r.doc_id for r in TO.quality_filter(df, rules).collect())
    assert kept == [0]
    # all columns survive the semi-join
    assert TO.quality_filter(df, rules).columns == ["doc_id", "text"]
    # no rules → everything passes; unknown rule → loud error
    assert TO.quality_filter(df, {}).count() == len(rows)
    with pytest.raises(ValueError, match="unknown quality rules"):
        TO.quality_filter(df, {"min_qualityness": 3})


def test_lm_perplexity_vs_duckdb(spark):
    """Fixed-point per-token log-probs → exact integer sums: the whole
    scoring pipeline is oracle-exact against a DuckDB recomputation on
    the same parquet (in-pytest gate pattern)."""
    import duckdb

    path = "/root/testdata/sf0.001/documents.parquet"
    got = (
        TO.lm_perplexity(spark.read.parquet(path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(f"""
WITH tk AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM '{path}'),
lm AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
tot AS (SELECT sum(cnt) AS T, count(*) AS V FROM lm),
scored AS (
  SELECT tk.doc_id,
         CAST(round(ln((CAST(coalesce(lm.cnt, 0) AS DOUBLE) + 1.0)
               / (CAST(tot.T AS DOUBLE) + 1.0 * (CAST(tot.V AS DOUBLE) + 1.0)))
             * 1000000.0, 0) AS BIGINT) AS lp
  FROM tk LEFT JOIN lm USING (term) CROSS JOIN tot)
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
       sum(lp) AS sum_logprob_fp,
       exp(-(CAST(sum(lp) AS DOUBLE) / 1000000.0) / CAST(count(*) AS DOUBLE)) AS ppl
FROM scored GROUP BY doc_id ORDER BY doc_id
""")
        .df()
        .reset_index(drop=True)
    )
    assert (got.doc_id == want.doc_id).all()
    assert (got.n_tokens == want.n_tokens).all()
    assert (got.sum_logprob_fp.astype("int64") == want.sum_logprob_fp.astype("int64")).all()
    # the EXACT comparable is the integer sum above; ppl derives from
    # it through exp(), which Java (Math.exp, 1-ulp contract) and C
    # (libm) round differently on some inputs — compare to 2 ulp
    import numpy as np

    assert np.allclose(got.ppl, want.ppl, rtol=1e-15, atol=0)


def test_lm_perplexity_orders_quality(spark):
    """Frequent-token (degenerate) docs score LOW, out-of-vocabulary
    text scores HIGH; a held-out model can be passed in."""
    rows = [(i, "the cat sat on the mat") for i in range(20)] + [
        (100, "the the the the the the"),       # degenerate → lowest ppl
        (101, "zyx wvu tsr qpo nml kji"),       # pure OOV → highest ppl
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = TO.lm_perplexity(df).toPandas().set_index("doc_id")
    assert got.ppl.loc[100] == got.ppl.min()
    assert got.ppl.loc[101] == got.ppl.max()
    # held-out model: score new docs under the fitted counts
    lm = TO.unigram_lm(df)
    fresh = spark.createDataFrame([(200, "the cat"), (201, "qqq www")],
                                  "doc_id long, text string")
    s = TO.lm_perplexity(fresh, lm=lm).toPandas().set_index("doc_id")
    assert s.ppl.loc[200] < s.ppl.loc[201]


def test_text_ops_empty_input(spark):
    """Every text operator degrades gracefully on an empty corpus —
    empty output, no crash (pipelines hit empty partitions/batches
    constantly at scale)."""
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert TO.repetition_metrics(empty).count() == 0
    assert TO.quality_filter(empty, {"min_tokens": 5}).count() == 0
    assert TO.text_metrics(empty).count() == 0
    assert TO.unigram_lm(empty).count() == 0
    assert TO.lm_perplexity(empty).count() == 0
    # rollup of nothing: Spark emits ZERO rows (no grand-total row,
    # unlike DuckDB's ANSI behavior of one empty-set group) — pin the
    # engine contract so pipeline callers know to guard
    cs = TO.corpus_stats(empty.withColumn("lang", F.lit("x")).withColumn(
        "source", F.lit("y")).limit(0)).toPandas()
    assert len(cs) == 0
