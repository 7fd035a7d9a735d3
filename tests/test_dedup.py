import pandas as pd
from pyspark.sql import functions as F

from ffcl_spark.operators import dedup as DD


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (3, "completely different content about spark shuffles and joins"),
        (4, "completely different content about spark shuffles and joins maybe"),
        (5, "unrelated text with nothing shared at all here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    got = DD.exact_dedup(_docs(spark)).toPandas().set_index("id")
    assert got.loc[0].canonical_id == 0 and got.loc[1].canonical_id == 0
    assert got.loc[0].group_size == 2
    assert got.loc[2].canonical_id == 2 and got.loc[2].group_size == 1


def test_ngram_jaccard_finds_near_dups(spark):
    got = DD.ngram_jaccard_pairs(_docs(spark), 0.3).toPandas()
    pairs = set(zip(got.id_a, got.id_b))
    assert (0, 1) in pairs  # identical → jaccard 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup
    assert (0, 5) not in pairs
    j01 = got[(got.id_a == 0) & (got.id_b == 1)].jaccard.iloc[0]
    assert j01 == 1.0


def test_minhash_subset_of_exact_and_finds_identicals(spark):
    docs = _docs(spark)
    mh = DD.minhash_dedup_pairs(docs, 0.3).toPandas()
    exact = DD.ngram_jaccard_pairs(docs, 0.3).toPandas()
    mh_pairs = set(zip(mh.id_a, mh.id_b))
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    assert mh_pairs <= exact_pairs  # verification step guarantees no FPs
    assert (0, 1) in mh_pairs  # identical docs always collide in LSH


def test_minhash_signature_deterministic(spark):
    docs = _docs(spark)
    a = DD.minhash_signatures(docs).toPandas().sort_values("id").reset_index(drop=True)
    b = DD.minhash_signatures(docs).toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_simhash_identical_docs_hamming_zero(spark):
    docs = _docs(spark)
    fps = DD.simhash(docs).toPandas().set_index("id").simhash
    assert fps.loc[0] == fps.loc[1]
    pairs = DD.simhash_neardup_pairs(docs, 0).toPandas()
    assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))


def test_simhash_in_32_bits(spark):
    fps = DD.simhash(_docs(spark)).toPandas()
    assert (fps.simhash >= 0).all() and (fps.simhash < 2**32).all()


def test_short_docs_do_not_crash_shingle_pipelines(spark):
    # docs with < n tokens used to make sequence(1,0) → element_at(,0)
    # throw; they must instead contribute zero shingles (like the
    # DuckDB oracle's empty generate_series)
    rows = [
        (0, "hi"),
        (1, "two tokens"),
        (2, ""),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = DD.ngram_jaccard_pairs(docs, 0.3).toPandas()
    assert set(zip(got.id_a, got.id_b)) == {(3, 4)}
    sigs = DD.minhash_signatures(docs).toPandas()
    assert set(sigs.id) == {3, 4}  # shingle-less docs have no signature
    mh = DD.minhash_dedup_pairs(docs, 0.3).toPandas()
    assert set(zip(mh.id_a, mh.id_b)) == {(3, 4)}


def test_max_doc_freq_caps_candidate_generation_only(spark):
    docs = _docs(spark)
    full = DD.ngram_jaccard_pairs(docs, 0.3).toPandas()
    capped = DD.ngram_jaccard_pairs(docs, 0.3, max_doc_freq=10).toPandas()
    # cap above every shingle's document frequency → identical output,
    # with exact (uncapped) jaccard values
    a = full.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = capped.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dedup_groups_transitive_closure(spark):
    # explicit pair source exercising transitivity: A~B, B~C but no A~C
    # edge — all three must land in one group under min-id canonical
    docs = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("d", "y"), ("e", "z")],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    got = (
        DD.dedup_groups(docs, 0.3, pairs=pairs)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert got.loc["a"].canonical_id == "a"
    assert got.loc["b"].canonical_id == "a"
    assert got.loc["c"].canonical_id == "a"
    assert int(got.loc["a"].group_size) == 3
    # singletons are their own group of size 1
    assert got.loc["d"].canonical_id == "d" and int(got.loc["d"].group_size) == 1
    assert got.loc["e"].canonical_id == "e" and int(got.loc["e"].group_size) == 1


def test_dedup_groups_matches_local_union_find(spark):
    # default MinHash pair source vs a driver union-find over the same
    # verified pairs — group partition and canonical ids must agree
    docs = _docs(spark).withColumn("doc_id", F.col("doc_id").cast("string"))
    pairs = DD.minhash_dedup_pairs(docs, 0.3, "doc_id", "text").toPandas()
    got = DD.dedup_groups(docs, 0.3, "doc_id", "text").toPandas()

    parent = {str(i): str(i) for i in range(6)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.id_a, pairs.id_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {i: find(i) for i in parent}
    sizes = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    for _, row in got.iterrows():
        assert row.canonical_id == roots[row.id]
        assert int(row.group_size) == sizes[roots[row.id]]


def _span_oracle(rows, n, min_docs=2):
    wins = {}
    per_doc = []
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        ws = [
            (doc_id, i, " ".join(toks[i : i + n]))
            for i in range(len(toks) - n + 1)
        ]
        per_doc.extend(ws)
        for _, _, w in ws:
            wins.setdefault(w, set()).add(doc_id)
    dup = {w for w, ids in wins.items() if len(ids) >= min_docs}
    spans = {(d, p) for d, p, w in per_doc if w in dup}
    stats = {}
    for doc_id, text in rows:
        mine = [(d, p, w) for d, p, w in per_doc if d == doc_id]
        stats[doc_id] = (len(mine), sum(1 for _, _, w in mine if w in dup))
    return spans, stats


def test_duplicate_ngram_spans_match_oracle(spark):
    rows = [
        (0, "a b c d e f g h"),
        (1, "x y a b c d q r"),     # shares window "a b c d" with 0
        (2, "a b c d e z z z"),     # shares two windows with 0
        (3, "totally different words here now"),
        (4, "shorty"),              # shorter than n -> no windows
    ]
    n = 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = DD.duplicate_ngram_spans(df, n=n).toPandas()
    want_spans, want_stats = _span_oracle(rows, n)
    assert set(zip(got.id, got.pos)) == want_spans
    # the same window string gets the same hash everywhere
    by_hash = got.groupby("win_hash")["id"].nunique()
    assert (by_hash >= 2).all()

    stats = DD.duplicate_span_stats(df, n=n).toPandas().set_index("id")
    for doc_id, (nw, nd) in want_stats.items():
        assert stats.loc[doc_id].n_windows == nw
        assert stats.loc[doc_id].n_dup_windows == nd
    assert stats.loc[4].n_windows == 0  # short doc present with zeros


def test_duplicate_spans_runs_of_consecutive_windows(spark):
    # a long shared substring appears as a RUN of consecutive
    # duplicated windows — the suffix-array-dedup signature
    shared = "one two three four five six seven eight nine ten"
    rows = [(0, f"{shared} tail0 t0"), (1, f"head1 h1 {shared}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = DD.duplicate_ngram_spans(df, n=4).toPandas()
    pos0 = sorted(got[got.id == 0].pos)
    assert pos0 == list(range(0, 7))  # 10-token share -> 7 windows, contiguous
    pos1 = sorted(got[got.id == 1].pos)
    assert pos1 == list(range(2, 9))


def test_duplicate_spans_release_caches(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string"
    )
    from ffcl_spark.plans.cache import release

    out = DD.duplicate_ngram_spans(df, n=3)
    assert out.count() > 0
    release(out)
    assert getattr(out, "_ffcl_cached", None) == []


def test_contamination_spans_cross_table(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "clean text with no benchmark overlap at all"),
            (2, "prefix words then alpha beta gamma delta suffix"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "xx alpha beta gamma delta yy")], "doc_id long, text string"
    )
    got = DD.contamination_spans(corpus, probes, n=4).toPandas()
    # doc 0 leaks the probe 4-gram at pos 0; doc 2 at pos 3; doc 1 clean
    assert set(zip(got.id, got.pos)) == {(0, 0), (2, 3)}
    # empty probe set -> nothing flagged
    none = DD.contamination_spans(
        corpus, probes.where("doc_id < 0"), n=4
    ).toPandas()
    assert len(none) == 0


def test_ngram_contamination_pure_python_twin(spark):
    """Operator == a pure-Python shingle-set twin on the fixture:
    exact n_grams / n_hit / ratio per corpus doc, directional
    semantics (full containment of a short benchmark item in a longer
    doc scores 1.0 where Jaccard would be small), short docs absent,
    and broadcast on/off plans identical."""
    corpus = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a long training document quoting the quick brown fox "
            "jumps over the lazy dog verbatim inside more text"),
        (2, "completely different content about spark shuffles"),
        (3, "too short"),  # < n tokens → no shingles → absent
    ]
    bench = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "spark shuffles"),  # < n tokens → contributes nothing
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    rdf = spark.createDataFrame(bench, "doc_id long, text string")

    def sh(text, n=3):
        t = [w for w in text.split(" ") if w]
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    ref = set().union(*(sh(t) for _, t in bench)) if bench else set()
    want = {}
    for did, t in corpus:
        s = sh(t)
        if s:
            hit = len(s & ref)
            want[did] = (len(s), hit, hit / len(s))

    for bc in (True, False):
        got = {
            r.id: (r.n_grams, r.n_hit, r.ratio)
            for r in DD.ngram_contamination(
                cdf, rdf, broadcast_refs=bc
            ).collect()
        }
        assert got == want
    assert 3 not in got  # short doc absent
    assert got[0][2] == 1.0  # doc 0 fully contained in the benchmark
    # directional: doc 1 contains the whole benchmark item yet is much
    # longer — containment catches what symmetric Jaccard dilutes
    assert got[1][1] == len(sh(bench[0][1]))
