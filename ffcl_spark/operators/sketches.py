"""Frequency / cardinality / quantile sketches for corpus analytics.

The reference's statistics surface is exact and single-node
(``Statistics.hpp``: mean/variance/argmax over in-memory matrices). At
10^12 rows the analytics a pipeline actually asks of a corpus —
"which tokens/domains dominate?", "how many distinct?", "where is the
p99 document length?" — need bounded-state answers. This module gives
each question two paths in the engine's usual pattern:

- an EXACT path whose shuffle is one partial aggregation (safe
  whenever the key cardinality is bounded — it is the oracle), and
- a SKETCH path whose state is a fixed-size table independent of the
  corpus (count-min; Spark's native HLL++ for distinct), mergeable
  across partitions by construction, for the unbounded case.

All paths are plain DataFrame aggregations — partial (map-side)
combine, one shuffle of counter rows, no Python per row. The count-min
table is (depth × width) rows TOTAL at any corpus size; estimation
broadcasts it.

Determinism: the count-min hashes are ``xxhash64(value, depth_seed)``
— fixed seeds, so the sketch table is identical at any parallelism
and across restarts (the engine-wide restart-idempotency contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------- heavy hitters


def heavy_hitters(
    df: DataFrame, col: str, min_share: float, by: str | None = None
) -> DataFrame:
    """Exact heavy hitters: values of ``col`` carrying at least
    ``min_share`` of the rows (within each ``by`` group if given).

    Plan shape at any key cardinality (token-level heavy hitters at
    corpus scale have millions of keys): the key relation never
    leaves parallel execution. Ungrouped, the total is a count(*)
    first — metadata-only on parquet/Iceberg sources (row-group
    footers, no data scan) — so the share filter is a pushed-down
    literal predicate on the single partial-agg shuffle. Grouped, the
    per-group totals come from a window PARTITIONED BY the group —
    parallel, one scan. (A ROLLUP would fuse detail+total levels into
    one aggregation, but Catalyst plans the two consumers as two full
    input scans — measured; the count(*) form is strictly cheaper.)"""
    keys = [by] if by else []
    counts = df.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("cnt"))
    if by:
        from pyspark.sql import Window

        w = Window.partitionBy(by)
        out = counts.withColumn("share", F.col("cnt") / F.sum("cnt").over(w))
    else:
        n = df.count()
        out = counts.withColumn("share", F.col("cnt") / F.lit(float(n)))
    return out.where(F.col("share") >= min_share).select(*keys, col, "cnt", "share")


# ------------------------------------------------------------- count-min


def _cm_bucket(value: Column, depth: int, width: int) -> Column:
    # independent row per depth via a distinct fixed seed; pmod keeps
    # the bucket non-negative (xxhash64 is signed)
    return F.pmod(F.xxhash64(value, F.lit(depth * 0x9E3779B9 + 1)), F.lit(width))


def count_min_table(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch as a (depth, bucket, cnt) relation — d·w rows
    total at ANY corpus size; counts are exact int64 sums so sketches
    of disjoint inputs merge by addition (tested).

    One scan: each row contributes ``depth`` (depth, bucket) pairs via
    a generated array + posexplode, then one partial-agg shuffle of at
    most d·w counter rows per partition."""
    pairs = df.select(
        F.posexplode(
            F.array(*[_cm_bucket(F.col(col), j, width) for j in range(depth)])
        ).alias("depth", "bucket")
    )
    return (
        pairs.groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("width", F.lit(width))
    )


def count_min_estimate(
    cms: DataFrame, items: DataFrame, col: str, depth: int = 4
) -> DataFrame:
    """Point-frequency estimates for ``items[col]`` against a
    ``count_min_table`` result: (value, est) with the classic
    guarantee true ≤ est ≤ true + ε·N (ε = e/width w.h.p.).

    The sketch side is d·w rows — broadcast; the probe is a map-side
    join per depth + a min aggregation. No corpus rescan."""
    width = cms.select("width").head()[0]
    probes = items.select(
        F.col(col).alias("value"),
        F.posexplode(
            F.array(*[_cm_bucket(F.col(col), j, width) for j in range(depth)])
        ).alias("depth", "bucket"),
    )
    joined = probes.join(F.broadcast(cms), ["depth", "bucket"], "left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def count_min_heavy_hitters(
    df: DataFrame, col: str, min_share: float, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Sketch-candidates → exact-verify heavy hitters: the count-min
    estimate never underestimates, so every true heavy hitter is a
    candidate (no false negatives); the exact recount keeps only the
    real ones. Scale shape: candidate generation touches only the
    aggregated counter table; the verification groupBy is restricted
    to candidate rows by a broadcast semi-join — the same
    candidates-then-verify shape as the MinHash dedup family."""
    n = df.count()
    cms = count_min_table(df, col, width, depth)
    cand = count_min_estimate(
        cms, df.select(col).distinct(), col, depth
    ).where(F.col("est") >= min_share * n)
    exact = (
        df.join(F.broadcast(cand.select(F.col("value").alias(col))), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(n))
        .where(F.col("share") >= min_share)
    )
    return exact


# ---------------------------------------------------- distinct / quantiles


def distinct_count(df: DataFrame, cols: list[str], exact: bool = True, rsd: float = 0.05) -> DataFrame:
    """(n_distinct): exact (count-distinct shuffle of the distinct
    keys) or HLL++ (``approx_count_distinct`` — Spark's native
    fixed-state mergeable sketch, the 100-TB path)."""
    if exact:
        agg = F.count_distinct(*[F.col(c) for c in cols])
    else:
        agg = F.approx_count_distinct(F.concat_ws("\x1f", *cols), rsd)
    return df.agg(agg.alias("n_distinct"))


def quantiles(
    df: DataFrame, col: str, probs: list[float], exact: bool = True,
    accuracy: int = 10_000, by: str | None = None,
) -> DataFrame:
    """Quantiles of ``col`` at ``probs`` — exact (``percentile``:
    linear interpolation at rank (n−1)·q over the sorted values, the
    SQL-standard PERCENTILE_CONT contract DuckDB's quantile_cont
    matches) or approximate (``approx_percentile`` — a
    Greenwald-Khanna-style mergeable summary with bounded state, the
    unbounded-cardinality path; rank error ≤ 1/accuracy)."""
    keys = [by] if by else []
    fn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, F.lit(accuracy))
    )
    aggs = [
        fn(F.col(col), F.lit(p)).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
