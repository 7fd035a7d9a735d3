import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ffcl_spark.operators.ranking import bm25_scores, bm25_topk, doc_term_freqs, tf_idf

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "spark join table scan",
            "join join join window sort",
            "table scan  scan filter",  # double space: empty tokens dropped
            "window agg group sort sort",
            "spark spark spark",
            "filter scan table join spark window",
            "agg",
            "sort window sort window",
        ],
    }
)

QUERIES = pd.DataFrame(
    {"q_id": np.arange(3, dtype=np.int64), "q_text": ["spark join", "sort sort window", "missingterm"]}
)


def _tok(t):
    return [w for w in t.split(" ") if w]


def _bm25_oracle(docs, queries, k1=1.2, b=0.75):
    toks = {r.doc_id: _tok(r.text) for r in docs.itertuples()}
    n = len(toks)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for q in queries.itertuples():
        for term in sorted(set(_tok(q.q_text))):
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, ts in toks.items():
                tf = ts.count(term)
                if tf == 0:
                    continue
                s = idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
                key = (q.q_id, d)
                sc, nt = out.get(key, (0.0, 0))
                out[key] = (sc + s, nt + 1)
    return out


def test_doc_term_freqs(spark):
    got = doc_term_freqs(spark.createDataFrame(DOCS)).toPandas()
    row = got[(got.doc_id == 1) & (got.term == "join")]
    assert row.tf.tolist() == [3] and row.dl.tolist() == [5]
    # doc 2's double space must not create an empty term
    assert got[got.doc_id == 2].dl.unique().tolist() == [4]
    assert "" not in set(got.term)


def test_tf_idf_matches_oracle(spark):
    got = tf_idf(spark.createDataFrame(DOCS)).toPandas()
    n = len(DOCS)
    df = {}
    for t in DOCS.text:
        for term in set(_tok(t)):
            df[term] = df.get(term, 0) + 1
    for r in got.itertuples():
        tf = _tok(DOCS.text[DOCS.doc_id == r.doc_id].iloc[0]).count(r.term)
        want = tf * (math.log((n + 1) / (df[r.term] + 1)) + 1)
        assert r.doc_freq == df[r.term]
        assert r.weight == pytest.approx(want, rel=1e-12)
    # one (doc, term) row per distinct pair
    assert not got.duplicated(["doc_id", "term"]).any()


def test_bm25_scores_match_oracle(spark):
    got = bm25_scores(
        spark.createDataFrame(DOCS), spark.createDataFrame(QUERIES)
    ).toPandas()
    want = _bm25_oracle(DOCS, QUERIES)
    assert set(zip(got.q_id, got.doc_id)) == set(want)
    for r in got.itertuples():
        sc, nt = want[(r.q_id, r.doc_id)]
        assert r.score == pytest.approx(sc, rel=1e-12)
        assert r.n_terms == nt
    # query with no corpus term yields no rows
    assert (got.q_id == 2).sum() == 0


def test_bm25_topk_deterministic(spark):
    k = 3
    got = bm25_topk(
        spark.createDataFrame(DOCS), spark.createDataFrame(QUERIES), k
    ).toPandas()
    want = _bm25_oracle(DOCS, QUERIES)
    for q in (0, 1):
        rows = sorted(
            ((sc, d) for (qq, d), (sc, _) in want.items() if qq == q),
            key=lambda p: (-p[0], p[1]),
        )[:k]
        sub = got[got.q_id == q].sort_values("rank")
        assert sub.doc_id.tolist() == [d for _, d in rows]
        assert sub["rank"].tolist() == list(range(1, len(rows) + 1))


def test_bm25_on_sf_documents(spark):
    # smoke at fixture scale: the probe retrieves and every score is
    # positive and finite
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qs = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1], "q_text": ["spark join table", "query sort window"]})
    )
    got = bm25_topk(docs, qs, 5).toPandas()
    assert set(got.q_id) == {0, 1}
    assert (got.groupby("q_id")["rank"].max() == 5).all()
    assert np.isfinite(got.score).all() and (got.score > 0).all()


def test_postings_reuse_is_identical(spark):
    # the materialize-once path (pass a precomputed postings table)
    # must be value-identical to the self-computing DAG
    docs = spark.createDataFrame(DOCS)
    qs = spark.createDataFrame(QUERIES)
    postings = doc_term_freqs(docs).localCheckpoint()
    a = bm25_scores(docs, qs).toPandas()
    b = bm25_scores(docs, qs, postings=postings).toPandas()
    key = ["q_id", "doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    c = tf_idf(docs).toPandas()
    d = tf_idf(docs, postings=postings).toPandas()
    key2 = ["doc_id", "term"]
    pd.testing.assert_frame_equal(
        c.sort_values(key2).reset_index(drop=True),
        d.sort_values(key2).reset_index(drop=True),
    )


def test_ranking_plans_are_jvm_only(spark):
    df = bm25_topk(
        spark.createDataFrame(DOCS), spark.createDataFrame(QUERIES), 3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_postings_at_rest_roundtrip(spark, tmp_path):
    # stored == fly: BM25 against the bucket-partitioned postings index
    # must be value-identical to the self-computing operator
    from ffcl_spark.operators.ranking import (
        bm25_index_topk,
        read_postings,
        write_postings,
    )

    docs = spark.createDataFrame(DOCS)
    path = str(tmp_path / "postings_idx")
    write_postings(docs, path, n_buckets=8)

    queries = [(0, "spark join"), (1, "sort sort window")]
    got = (
        bm25_index_topk(spark, path, queries, 3)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    qdf = spark.createDataFrame(pd.DataFrame(queries, columns=["q_id", "q_text"]))
    want = (
        bm25_topk(docs, qdf, 3)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # sidecar stats are exact integers
    _, meta = read_postings(spark, path)
    assert meta["n_docs"] == len(DOCS)
    assert meta["sum_dl"] == sum(len(_tok(t)) for t in DOCS.text)


def test_postings_probe_partition_prunes(spark, tmp_path):
    from ffcl_spark.operators.ranking import read_postings, write_postings

    docs = spark.createDataFrame(DOCS)
    path = str(tmp_path / "postings_prune")
    write_postings(docs, path, n_buckets=8)
    pruned, _ = read_postings(spark, path, terms=["spark"])
    txt = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in txt
    assert "bucket" in txt.split("PartitionFilters", 1)[1][:200]
    # and the pruned read still contains every 'spark' posting
    got = pruned.where(F.col("term") == "spark").toPandas()
    want = sum(1 for t in DOCS.text if "spark" in _tok(t))
    assert got.doc_id.nunique() == want


def test_append_postings_maintenance(spark, tmp_path):
    """Epoch append: stats accrue from the per-epoch sidecars, queries
    over (build + append) equal the one-shot fly path, and an epoch
    replay neither duplicates postings nor double-counts stats."""
    from ffcl_spark.operators.ranking import (
        append_postings,
        bm25_index_topk,
        read_postings,
        write_postings,
    )

    docs = spark.createDataFrame(DOCS)
    half0 = docs.where(F.col("doc_id") % 2 == 0)
    half1 = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "postings_epochs")
    write_postings(half0, path, n_buckets=8)
    append_postings(half1, path, epoch=1)

    p, meta = read_postings(spark, path)
    assert meta["n_docs"] == len(DOCS)
    assert meta["sum_dl"] == sum(len(_tok(t)) for t in DOCS.text)

    queries = [(0, "spark join"), (1, "sort sort window")]
    got = (
        bm25_index_topk(spark, path, queries, 3)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    qdf = spark.createDataFrame(pd.DataFrame(queries, columns=["q_id", "q_text"]))
    want = (
        bm25_topk(docs, qdf, 3)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # replay epoch 1: idempotent (rows and stats unchanged)
    n_before = p.count()
    append_postings(half1, path, epoch=1)
    p2, meta2 = read_postings(spark, path)
    assert p2.count() == n_before and meta2["n_docs"] == meta["n_docs"]


def test_compact_postings(spark, tmp_path):
    """Compaction collapses the epochs into one, merges the stats
    sidecars, and changes no query result."""
    import glob

    from ffcl_spark.operators.ranking import (
        append_postings,
        bm25_index_topk,
        compact_postings,
        read_postings,
        write_postings,
    )

    docs = spark.createDataFrame(DOCS)
    path = str(tmp_path / "postings_compact")
    write_postings(docs.where(F.col("doc_id") % 2 == 0), path, n_buckets=8)
    append_postings(docs.where(F.col("doc_id") % 2 == 1), path, epoch=1)

    queries = [(0, "spark join"), (1, "sort sort window")]
    before = bm25_index_topk(spark, path, queries, 3).toPandas().sort_values(
        ["q_id", "rank"]
    ).reset_index(drop=True)
    _, meta_before = read_postings(spark, path)

    compact_postings(spark, path)
    assert len(glob.glob(f"{path}/stats_epoch_*.json")) == 1
    assert {d.split("epoch=")[1].split("/")[0]
            for d in glob.glob(f"{path}/postings/bucket=*/epoch=*")} == {"0"}
    after = bm25_index_topk(spark, path, queries, 3).toPandas().sort_values(
        ["q_id", "rank"]
    ).reset_index(drop=True)
    _, meta_after = read_postings(spark, path)
    assert meta_after["n_docs"] == meta_before["n_docs"]
    assert meta_after["sum_dl"] == meta_before["sum_dl"]
    pd.testing.assert_frame_equal(before, after, check_dtype=False)
