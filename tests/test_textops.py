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
