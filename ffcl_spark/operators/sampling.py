"""Deterministic data-selection operators (training-data-pipeline
extensions): seeded subsampling, stratified sampling, mixture
weighting across corpora, leakage-safe train/test splits, and
exact-size ordered samples.

Every operator derives its keep/assign decision from a seeded md5
bucket of the row's (or group's) key — a pure projection + filter, so:

- **deterministic & engine-portable**: the same (key, seed) keeps the
  same row in any engine (the DuckDB oracles recompute the identical
  rule), on any partitioning, at any parallelism;
- **zero shuffle** for rate-based sampling and splits (whole-stage
  codegen filter; Catalyst pushes it below wide plans and Parquet
  scans keep only matching row groups via the id predicate's stats);
- **restart-idempotent**: re-running a failed job re-selects exactly
  the same rows — no RNG state to checkpoint.

The reference's sampling surface is driver-local Fisher–Yates
(`Sampling.hpp:13-26` ``select_n_elements``, `:45-60`
``select_random_sample``) and MT19937 uniforms
(`Distributions.hpp:16-61`); a distributed engine replaces "shuffle
then take n" with a seeded total order (``topk_sample``) and
"keep with probability p" with a seeded hash threshold
(``hash_sample``), which are the same distributions without shared
RNG state. Realized sizes of rate-based samples are Binomial(n, p)
(±O(√n), negligible at pipeline scale); ``topk_sample`` and
``mix_corpora(exact=True)`` give exact sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32  # buckets are the first 8 hex chars of md5 → uint32


def seeded_bucket(key: Column, seed: int) -> Column:
    """Uniform integer in [0, 2^32) derived from md5("{key}:{seed}").

    The same construction as the engine's sampled-silhouette filter
    (`operators/stats.py`) and the SQL twin
    ``CAST('0x' || substr(md5(key || ':seed'), 1, 8) AS BIGINT)``.
    """
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _threshold(rate: float) -> int:
    """Keep-threshold for a rate: bucket < floor(rate * 2^32)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * HASH_SPACE)


def hash_sample(
    df: DataFrame, rate: float, seed: int = 7, id_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff its seeded bucket < rate·2^32.

    Pure filter — no shuffle, no RNG state; deterministic per
    (id, seed) regardless of partitioning. Disjoint seeds give
    independent samples of the same table (e.g. eval carve-outs).
    """
    return df.where(seeded_bucket(F.col(id_col), seed) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    seed: int = 7,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rate-based sampling (e.g. per-language quotas).

    One CASE over the stratum column selects the threshold; still a
    zero-shuffle codegen filter. Strata missing from ``rates`` use
    ``default_rate`` (0 ⇒ dropped).
    """
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold(rate))).otherwise(thr)
    return df.where(seeded_bucket(F.col(id_col), seed) < thr)


def split_by_group(
    df: DataFrame,
    test_frac: float,
    group_col: str,
    seed: int = 7,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/test split: the bucket is computed on the
    GROUP key (domain, url, dedup-canonical id, …) so every row of a
    group lands on the same side — near-duplicates sharing a group can
    never straddle the split. Zero shuffle (projection only)."""
    is_test = seeded_bucket(F.col(group_col), seed) < F.lit(_threshold(test_frac))
    return df.withColumn(split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-corpus keep rates realizing target mixture ``weights`` with
    maximum data retention: the feasible total is bounded by the
    scarcest corpus, T = min_c count_c / w_c (w normalized), and each
    corpus keeps T·w_c of its count_c rows.

    Pure arithmetic on the (tiny) per-corpus count dict — exposed
    separately so the oracle/tests can pin the rates, and so iterative
    callers can reuse counts across epochs.
    """
    if not weights:
        raise ValueError("weights is empty — no corpora to mix")
    missing = [c for c in weights if c not in counts]
    if missing:
        raise ValueError(f"weights name corpora absent from counts: {missing}")
    total_w = sum(weights.values())
    norm = {c: w / total_w for c, w in weights.items()}
    feasible_total = min(counts[c] / norm[c] for c in norm)
    return {c: min(1.0, feasible_total * norm[c] / counts[c]) for c in norm}


def mix_corpora(
    df: DataFrame,
    corpus_col: str,
    weights: dict[str, float],
    seed: int = 7,
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Downsample corpora to a target mixture (corpora not named in
    ``weights`` are dropped).

    Two passes: a count aggregation per corpus (partial agg, one tiny
    shuffle of |corpora| rows), then a stratified threshold filter —
    realized proportions are Binomial-tight around the targets.
    ``exact=True`` instead ranks rows per corpus by (bucket, id) and
    keeps exactly ⌊T·w_c⌋ — an extra shuffle on the corpus key whose
    per-corpus sort is single-task, so reserve it for corpus counts
    that fit one task (eval sets); the rate path is the 100-TB form.
    """
    counts_rows = (
        df.where(F.col(corpus_col).isin(list(weights)))
        .groupBy(corpus_col)
        .count()
        .collect()
    )
    counts = {r[corpus_col]: r["count"] for r in counts_rows}
    rates = mixture_rates(counts, {c: w for c, w in weights.items() if c in counts})
    base = df.where(F.col(corpus_col).isin(list(counts)))
    if not exact:
        return stratified_sample(base, corpus_col, rates, seed=seed, id_col=id_col)
    total_w = sum(w for c, w in weights.items() if c in counts)
    norm = {c: weights[c] / total_w for c in counts}
    feasible_total = min(counts[c] / norm[c] for c in norm)
    keep: Column = F.lit(0)
    for c in sorted(counts):
        keep = F.when(F.col(corpus_col) == c, F.lit(int(feasible_total * norm[c]))).otherwise(keep)
    from pyspark.sql import Window

    w = Window.partitionBy(corpus_col).orderBy(
        seeded_bucket(F.col(id_col), seed), F.col(id_col)
    )
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= keep)
        .drop("__rk")
    )


def topk_sample(
    df: DataFrame, n: int, seed: int = 7, id_col: str = "doc_id"
) -> DataFrame:
    """Exact-size deterministic sample: the n smallest seeded buckets
    (ties broken by id). Distributed top-k (TakeOrderedAndProject —
    per-partition heaps, no full sort), the scale form of the
    reference's Fisher–Yates ``select_n_elements``."""
    return df.orderBy(seeded_bucket(F.col(id_col), seed), F.col(id_col)).limit(n)


def pack_chunks(
    df: DataFrame,
    chunk_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, shard, offset): the concat-then-chunk training
    layout — documents are concatenated in ``order_col`` order
    (default: id order) and the token stream is split into fixed
    ``chunk_tokens`` shards; each document gets the shard and
    within-shard offset where its FIRST token lands. Chunk boundaries
    cut straddling documents, exactly as LLM-pretraining packing does.

    Plan — distributed prefix sum without a global sort:

    1. range-partition by the (order, id) key, so partition i holds a
       contiguous, disjoint key range below partition i+1's;
    2. one tiny aggregate of per-partition token subtotals (bounded by
       the partition count — the hot-groups pattern) becomes a
       broadcast of exclusive partition offsets;
    3. a per-partition window cumsum adds the local exclusive prefix.

    The result depends only on the global order and the token counts —
    partition boundaries cancel out — so the assignment is
    deterministic at any parallelism (pinned in pytest)."""
    from ffcl_spark.functions import text as X

    order = order_col or id_col
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(order).alias("ord"),
        F.size(X.tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    n_part = partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins ONE materialized partitioning: the range
    # partitioner SAMPLES its boundaries per execution, and this frame
    # is consumed twice (the subtotal collect and the final plan) —
    # without the cut, the two executions could disagree on which pid
    # a key lands in and the broadcast offsets would join wrongly
    ranged = (
        base.repartitionByRange(n_part, F.col("ord"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # bounded collect: one row per partition (the hot-groups pattern)
    totals = (
        ranged.groupBy("pid")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.min(F.struct("ord", "id")).alias("lo"),
        )
        .collect()
    )
    # partition ids are assigned by the range partitioner in key order,
    # but sort by the partition's minimum key to make the offsets
    # independent of that contract
    running, offsets = 0, {}
    for row in sorted(totals, key=lambda r: (r["lo"]["ord"], r["lo"]["id"])):
        offsets[row["pid"]] = running
        running += row["t"]
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "pid int, part_off long"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("pid")
        .orderBy("ord", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("part_off")
    return (
        ranged.join(F.broadcast(off_df), "pid")
        .withColumn("start", start)
        .select(
            "id",
            "n_tokens",
            F.floor(F.col("start") / F.lit(chunk_tokens)).alias("shard"),
            (F.col("start") % F.lit(chunk_tokens)).alias("offset"),
        )
    )
