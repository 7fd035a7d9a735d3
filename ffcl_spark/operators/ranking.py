"""Text retrieval scoring over a (doc_id, text) corpus: TF-IDF term
weights and Okapi BM25 query→document ranking.

Training-data-pipeline extensions (task brief): quality-weighted
retrieval is how a 100-TB corpus gets queried for curriculum /
decontamination slices ("find the documents matching this probe set")
without an external search service.

Scale design
------------
One corpus scan builds the postings list (doc, term, tf) — a single
explode + partial-aggregated groupBy. Corpus statistics (N, avgdl) are
a one-row aggregate broadcast-joined, never a driver round-trip inside
the plan. Document frequencies shuffle once on term. Queries are the
small side by construction (a probe set, not the corpus): they ride a
broadcast hash join against the postings, so scoring touches only the
postings rows whose term appears in some query — the inverted-index
access path, O(matching postings), not O(corpus). All arithmetic is
JVM column expressions (ln/divide on doubles) — WholeStageCodegen, no
Python anywhere.

Determinism: tokenization is the engine's whitespace ``tokens``
(functions/text.py — the DuckDB twin is
``list_filter(string_split(text,' '), t -> t <> '')``); tf/df/dl/N are
integers; idf and the BM25 kernel are single double expressions per
row computed from those integers, so a SQL oracle reproduces scores to
the last ulp up to the final cross-term sum (fixed-point round at the
gate, same discipline as the silhouette oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ffcl_spark.functions import text as X

__all__ = [
    "doc_term_freqs",
    "tf_idf",
    "bm25_scores",
    "bm25_topk",
    "write_postings",
    "read_postings",
    "append_postings",
    "compact_postings",
    "bm25_index_topk",
]


def doc_term_freqs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings list: (doc_id, term, tf, dl) — one explode + one
    partial-agg groupBy; dl (document length in tokens) rides along so
    downstream scoring needs no second corpus scan."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(X.tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "doc_id")


def _corpus_stats(postings: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) aggregate for broadcast."""
    return (
        postings.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Smoothed TF-IDF weights per (doc_id, term):
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` (the sklearn-style smooth
    idf — never negative, defined for df == N). Integer tf/df/N in,
    one double expression out.

    ``postings`` — precomputed ``doc_term_freqs`` output. Without it
    the lazy DAG recomputes the postings subtree for each of the
    df/stats branches; at corpus scale, materialize the postings once
    (term-bucketed parquet, the text twin of ``write_ann_index``) and
    pass them here so the corpus is scanned exactly once."""
    if postings is None:
        postings = doc_term_freqs(df, id_col, text_col)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = _corpus_stats(postings)
    idf = F.log(
        (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    ) + F.lit(1.0)
    return (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("df").alias("doc_freq"),
            (F.col("tf") * idf).alias("weight"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 score for every (query, doc) pair sharing >= 1 term:

    ``score(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with the Robertson idf ``ln(1 + (N - df + 0.5) / (df + 0.5))``.

    Duplicate terms inside a query are collapsed (qtf = 1 — the common
    short-probe form). Queries are broadcast; only postings matching a
    query term flow into the aggregation. ``postings`` as in
    ``tf_idf`` — pass a materialized postings table to scan the corpus
    once instead of once per df/stats branch."""
    if postings is None:
        postings = doc_term_freqs(docs, id_col, text_col)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = _corpus_stats(postings)

    qterms = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(F.array_distinct(X.tokens(F.col(q_text_col)))).alias("term"),
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / norm

    # df only for terms some query mentions: semi-join the (possibly
    # vocabulary-sized) dfreq down to the probe terms before broadcast
    q_df = dfreq.join(F.broadcast(qterms.select("term").distinct()), "term")

    return (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(q_df), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(contrib).alias("score"), F.count(F.lit(1)).alias("n_terms"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    **kw,
) -> DataFrame:
    """Top-k documents per query by BM25, deterministic tie-break
    (score desc, doc_id asc) — the retrieval form. Window top-k gets
    the map-side WindowGroupLimit prune, so only ~k rows per query per
    partition reach the rank shuffle (confirmed: Partial + Final
    WindowGroupLimit in the physical plan)."""
    scored = bm25_scores(docs, queries, k1=k1, b=b, **kw)
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


# ------------------------------------------------------ postings at rest

def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver twin of the Spark bucket rule (md5-prefix mod)."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(term, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def write_postings(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the inverted index at rest: the (doc_id, term, tf, dl)
    postings written as parquet PARTITIONED BY a term-hash bucket,
    plus a JSON sidecar with the exact corpus stats (n_docs, sum_dl
    as integers). Tokenize once, query many times — probe-term bucket
    filters partition-prune the scan, so a BM25 probe reads only the
    buckets its terms hash to, never the corpus. The text twin of
    ``similarity.write_ann_index``."""
    import json

    postings = doc_term_freqs(docs, id_col, text_col)
    bucketed = postings.withColumn(
        "bucket", _term_bucket_col(F.col("term"), n_buckets)
    )
    # (bucket, epoch) layout so append_postings can add batches under
    # the same partition scheme; the initial build is epoch=0
    bucketed.withColumn("epoch", F.lit(0)).write.mode("overwrite").partitionBy(
        "bucket", "epoch"
    ).parquet(f"{path}/postings")
    meta = {"n_buckets": int(n_buckets)}
    with open(f"{path}/meta.json".replace("file:", ""), "w") as f:
        json.dump(meta, f)
    _write_epoch_stats(postings, path, 0)


def _write_epoch_stats(postings: DataFrame, path: str, epoch: int) -> None:
    """Per-epoch exact integer stats sidecar (``stats_epoch_<n>.json``).
    ``read_postings`` sums them, so appending an epoch updates the
    corpus stats without rewriting anything — and replaying an epoch
    overwrites only its own file (idempotent)."""
    import json

    row = (
        postings.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
        .first()
    )
    stats = {"n_docs": int(row["n_docs"] or 0), "sum_dl": int(row["sum_dl"] or 0)}
    with open(f"{path}/stats_epoch_{int(epoch)}.json".replace("file:", ""), "w") as f:
        json.dump(stats, f)


def append_postings(
    docs: DataFrame,
    path: str,
    epoch: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance of the postings index at rest: tokenize
    a new doc batch, write its postings under ``(bucket, epoch)``
    partitions with dynamic overwrite, and record the batch's exact
    stats in its own sidecar — an epoch replay rewrites exactly its
    own partitions AND its own stats file, so corpus stats never
    double-count. Probes are unchanged: probe-term bucket filters
    prune across every epoch, and each term's postings stay colocated
    in its bucket (df counts remain complete)."""
    import json

    from ffcl_spark.plans.epoch_write import overwrite_epoch_partitions

    with open(f"{path}/meta.json".replace("file:", "")) as f:
        n_buckets = json.load(f)["n_buckets"]
    postings = doc_term_freqs(docs, id_col, text_col)
    bucketed = postings.withColumn(
        "bucket", _term_bucket_col(F.col("term"), n_buckets)
    ).withColumn("epoch", F.lit(int(epoch)))
    overwrite_epoch_partitions(bucketed, f"{path}/postings", "bucket", "epoch")
    _write_epoch_stats(postings, path, epoch)


def read_postings(
    spark, path: str, terms: list[str] | None = None
) -> tuple[DataFrame, dict]:
    """Load postings written by ``write_postings``. With ``terms``,
    the scan carries a bucket IN-filter over the partition column —
    only those buckets' files are read (PartitionFilters in the
    physical plan). Returns (postings, meta)."""
    import glob
    import json

    with open(f"{path}/meta.json".replace("file:", "")) as f:
        meta = json.load(f)
    # corpus stats = sum of the per-epoch sidecars (initial build is
    # stats_epoch_0; appends add their own)
    meta["n_docs"], meta["sum_dl"] = 0, 0
    for p in glob.glob(f"{path}/stats_epoch_*.json".replace("file:", "")):
        with open(p) as f:
            s = json.load(f)
        meta["n_docs"] += s["n_docs"]
        meta["sum_dl"] += s["sum_dl"]
    df = spark.read.parquet(f"{path}/postings").drop("epoch")
    if terms is not None:
        buckets = sorted({_term_bucket_py(t, meta["n_buckets"]) for t in terms})
        df = df.where(F.col("bucket").isin(buckets))
    return df, meta


def bm25_index_topk(
    spark,
    path: str,
    queries: list[tuple[int, str]],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k against postings AT REST: probe terms are known on
    the driver (queries is a bounded (q_id, text) list — the probe-set
    contract, same position as ``pq_topk``'s query set), so their
    buckets prune the postings scan; document frequencies come from
    the pruned buckets (each term's postings are colocated in its
    bucket, so per-term counts are complete); corpus stats come from
    the exact integer sidecar. Value-identical to ``bm25_topk`` on the
    fly (pinned in pytest)."""
    all_terms = sorted(
        {t for _, text in queries for t in text.split(" ") if t}
    )
    postings, meta = read_postings(spark, path, terms=all_terms)
    qdf = spark.createDataFrame(
        [(int(i), t) for i, t in queries], "q_id long, q_text string"
    )
    # df per term from the pruned buckets; stats from the sidecar —
    # the same IEEE division the in-plan stats aggregate performs
    stats = spark.createDataFrame(
        [(meta["n_docs"], float(meta["sum_dl"]) / float(meta["n_docs"]))],
        "n_docs long, avgdl double",
    )
    qterms = qdf.select(
        "q_id",
        F.explode(F.array_distinct(X.tokens(F.col("q_text")))).alias("term"),
    )
    dfreq = (
        postings.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(contrib).alias("score"), F.count(F.lit(1)).alias("n_terms"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).where(
        F.col("rank") <= k
    )


def compact_postings(spark, path: str) -> None:
    """Collapse all postings epochs into one and merge the per-epoch
    stats sidecars (small-files maintenance after many appends).
    Query results are unchanged."""
    import glob
    import json
    import os

    from ffcl_spark.plans.epoch_write import compact_epochs

    compact_epochs(spark, f"{path}/postings", "bucket")
    n_docs = sum_dl = 0
    files = sorted(glob.glob(f"{path}/stats_epoch_*.json".replace("file:", "")))
    for p in files:
        with open(p) as f:
            s = json.load(f)
        n_docs += s["n_docs"]
        sum_dl += s["sum_dl"]
    for p in files:
        os.remove(p)
    with open(f"{path}/stats_epoch_0.json".replace("file:", ""), "w") as f:
        json.dump({"n_docs": n_docs, "sum_dl": sum_dl}, f)
