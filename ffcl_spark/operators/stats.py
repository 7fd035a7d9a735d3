"""Feature statistics + silhouette score.

- ``feature_stats``: per-cell (or global) mean/variance per feature —
  the reference's axis-selection statistics (``Statistics.hpp:137-330``,
  variance-argmax axis selection ``AxisSelectionPolicy.hpp:77-109``).
  One partial-aggregating groupBy.
- ``silhouette_samples`` / ``silhouette_score``: per-sample silhouette
  (reference ``SilhouetteMethod.hpp:69-114``): cohesion a(i) = mean
  distance to own cluster (self excluded), separation b(i) = min over
  other clusters of mean distance, s = (b−a)/max(a,b); points alone in
  their cluster get s = 0.

  The pairwise form is quadratic by definition; this implementation
  shuffles (point × cluster) partial sums, so cost is
  O(pairs within + across clusters) with map-side partial aggregation.
  ``max_refs_per_cluster`` bounds the reference side per cluster via a
  seeded deterministic sample — the documented scale path (exact when
  the cap exceeds every cluster; sampled-estimator semantics below it).
  The metric keeps the reference's evaluation position (silhouette is
  model selection, not a data-path operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.config import EngineConfig
from ffcl_spark.functions import cells as C


def feature_stats(points: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """mean/variance per feature, optionally per cell. Variance is the
    sample variance (unbiased), matching ``var_samp``."""
    aggs = [
        F.avg("x").alias("mean_x"),
        F.avg("y").alias("mean_y"),
        F.var_samp("x").alias("var_x"),
        F.var_samp("y").alias("var_y"),
        F.count(F.lit(1)).alias("n"),
    ]
    if cfg is None:
        return points.agg(*aggs)
    return (
        points.withColumn("cell", C.cell_id(F.col("x"), F.col("y"), cfg))
        .groupBy("cell")
        .agg(*aggs)
    )


def feature_stats_exact(
    points: DataFrame, cfg: EngineConfig | None = None, scale: int = 1000
) -> DataFrame:
    """Partitioning-invariant mean/variance per feature via FIXED-POINT
    integer sums — the reproducibility form of :func:`feature_stats`
    for coordinates on a known grid (the engine's media coordinates are
    exact multiples of 1/1000).

    ``v = round(coord·scale)`` is an exact int64; Σv and Σv² are exact
    int64 sums (order-free), and mean = Σv / n / scale and
    var = (n·Σv² − (Σv)²) / (n·(n−1)·scale²) are each ONE float
    division expression — identical bits at any parallelism, any AQE
    plan, and in any engine evaluating the same expression.

    Bounds: |v| ≤ scale·domain/2 = 3·10⁴, so Σv² ≤ n·9·10⁸ stays inside
    int64 up to ~10¹⁰ rows per group. The variance NUMERATOR
    n·Σv² − (Σv)² overflows int64 far earlier (~10⁵ rows per group at
    the domain edge — round-3 ADVICE repro), so the products run in
    decimal(38,0): exact integers to (Σv)² ≤ 10³⁸ ⇒ ~3·10¹⁴ rows per
    group, matching DuckDB's HUGEINT promotion bit-for-bit after the
    single round-to-double.
    """
    vx = F.round(F.col("x") * scale).cast("long")
    vy = F.round(F.col("y") * scale).cast("long")
    aggs = [
        F.sum(vx).alias("sx"),
        F.sum(vy).alias("sy"),
        F.sum(vx * vx).alias("sxx"),
        F.sum(vy * vy).alias("syy"),
        F.count(F.lit(1)).alias("n"),
    ]
    s2 = float(scale * scale)
    n = F.col("n")
    dec = "decimal(38,0)"

    def _var(ss: str, s: str):
        # exact integer numerator in decimal(38,0) (int64 products
        # overflow at ~1e5 rows/group near the domain edge), ONE cast
        # to double — DuckDB's HUGEINT arithmetic lands on the same
        # exact integer, so the rounded double is bit-equal
        nd = n.cast(dec)
        num = nd * F.col(ss).cast(dec) - F.col(s).cast(dec) * F.col(s).cast(dec)
        return num.cast("double") / (n * (n - 1)).cast("double") / F.lit(s2)

    def _finish(df):
        return df.select(
            *([c for c in ("cell",) if c in df.columns]),
            (F.col("sx").cast("double") / n / scale).alias("mean_x"),
            (F.col("sy").cast("double") / n / scale).alias("mean_y"),
            F.when(n > 1, _var("sxx", "sx")).alias("var_x"),
            F.when(n > 1, _var("syy", "sy")).alias("var_y"),
            "n",
        )

    if cfg is None:
        return _finish(points.agg(*aggs))
    return _finish(
        points.withColumn("cell", C.cell_id(F.col("x"), F.col("y"), cfg))
        .groupBy("cell")
        .agg(*aggs)
    )


def argmax_variance_axis(points: DataFrame, sampling_rate: float = 0.1, seed: int = 7) -> str:
    """Highest-variance axis on a sample — the reference's default
    axis-selection policy (``AxisSelectionPolicy.hpp:77-109``,
    sampling_rate=0.1)."""
    row = (
        points.sample(sampling_rate, seed=seed)
        .agg(F.var_samp("x").alias("vx"), F.var_samp("y").alias("vy"))
        .collect()[0]
    )
    return "x" if (row["vx"] or 0.0) >= (row["vy"] or 0.0) else "y"


def silhouette_samples(
    points: DataFrame,
    labels: DataFrame,
    max_refs_per_cluster: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """(id, label, a, b, silhouette) per sample. ``labels``: (id, label).

    ``max_refs_per_cluster`` is the bounded scale path (round-3 VERDICT
    task #5): the reference side of the pair shuffle is downsampled per
    cluster to an expected ≤ cap rows by a seeded md5 filter (the same
    deterministic-subset device as the engine's gate fixtures), so cost
    drops from O(n²) to O(n · k · cap) while a(i)/b(i) become means
    over the cluster samples — the standard sampled-silhouette
    estimator. With cap ≥ every cluster size the filter keeps
    everything and the result is EXACTLY the full metric (fraction 1 —
    parity pinned in tests/test_stats.py). Evaluation metric position
    unchanged from the reference (``SilhouetteMethod.hpp`` is model
    selection), but at 100× the bounded form is the plan you'd run."""
    from pyspark.sql import Window

    p = points.join(labels, "id").select("id", "x", "y", "label")
    refs = p
    if max_refs_per_cluster is not None:
        sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("c_n"))
        frac = F.least(
            F.lit(1.0), F.lit(float(max_refs_per_cluster)) / F.col("c_n")
        )
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("", F.col("id").cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        # independent per-cluster sampling can leave a cluster with zero
        # sampled refs (or only point i itself), which silently turned
        # a(i)/b(i) NULL → silhouette 0.0 and dropped whole clusters
        # from the b(i) min at small caps (round-4 ADVICE). Guarantee:
        # the two smallest ids of every cluster are ALWAYS kept, so
        # every non-empty cluster contributes to every b(i), and every
        # point of a ≥2-point cluster has an own-cluster ref ≠ itself —
        # the remaining NULL-a case is exactly the true singleton,
        # whose s = 0 is the reference's definition, not a sampling
        # artifact. Exactness when the cap covers every cluster is
        # unchanged (those rows were already kept).
        rw = Window.partitionBy("label").orderBy("id")
        refs = (
            p.join(F.broadcast(sizes), "label")
            .withColumn("keep_rank", F.row_number().over(rw))
            .where(
                (F.col("keep_rank") <= 2)
                | (F.pmod(h, F.lit(1_000_000)).cast("double") < frac * 1_000_000)
            )
            .select("id", "x", "y", "label")
        )
    a = p.select(
        F.col("id").alias("i"),
        F.col("x").alias("xi"),
        F.col("y").alias("yi"),
        F.col("label").alias("li"),
    )
    b = refs.select(
        F.col("id").alias("j"),
        F.col("x").alias("xj"),
        F.col("y").alias("yj"),
        F.col("label").alias("lj"),
    )
    pair = (
        a.crossJoin(b)
        .where(F.col("i") != F.col("j"))
        .select(
            "i",
            "li",
            "lj",
            F.sqrt(
                (F.col("xi") - F.col("xj")) * (F.col("xi") - F.col("xj"))
                + (F.col("yi") - F.col("yj")) * (F.col("yi") - F.col("yj"))
            ).alias("d"),
        )
    )
    per_cluster = pair.groupBy("i", "li", "lj").agg(
        F.avg("d").alias("mean_d"), F.count(F.lit(1)).alias("n")
    )
    own = per_cluster.where(F.col("li") == F.col("lj")).select(
        "i", F.col("mean_d").alias("a")
    )
    other = (
        per_cluster.where(F.col("li") != F.col("lj"))
        .groupBy("i")
        .agg(F.min("mean_d").alias("b"))
    )
    out = (
        p.select(F.col("id").alias("i"), "label")
        .join(own, "i", "left")
        .join(other, "i", "left")
        .withColumn(
            "silhouette",
            F.when(
                F.col("a").isNull() | F.col("b").isNull(), F.lit(0.0)
            ).otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b")),
        )
        .select(F.col("i").alias("id"), "label", "a", "b", "silhouette")
    )
    return out


def silhouette_score(
    points: DataFrame,
    labels: DataFrame,
    max_refs_per_cluster: int | None = None,
    seed: int = 7,
) -> float:
    """Mean silhouette (reference ``get_average_silhouette``)."""
    return float(
        silhouette_samples(points, labels, max_refs_per_cluster, seed)
        .agg(F.avg("silhouette"))
        .collect()[0][0]
    )
