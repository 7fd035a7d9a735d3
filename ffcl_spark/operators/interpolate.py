"""Inverse-distance-weighted (IDW) spatial interpolation — estimate a
scalar field at query sites from the k nearest observed samples,
planar or geodesic.

The reference engine stops at the neighbor SET (``StaticBuffer.hpp``'s
(index, distance) pairs); IDW is the canonical consumer a geospatial
engine serves on top of it (Shepard 1968): for query q with neighbors
(r_i, d_i) carrying values v_i,

    idw(q) = Σ w_i·v_i / Σ w_i,   w_i = 1 / max(d_i, eps)^power

with the exact-hit rule: if any neighbor sits at distance 0, its value
is returned directly (the limit of the weights; ties by neighbor id).

Determinism contract: float summation order changes the low bits, so
the fold runs over the rank-SORTED neighbor array inside one JVM
``aggregate`` expression — the summation order is defined by the kNN
contract (dist, then id), making the result invariant under input
partitioning and AQE re-plans. The plan is the exact kNN join (one
value-join on the neighbor id, broadcast when the sample side is
small) + a |queries|-row aggregation; nothing new shuffles beyond the
kNN join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _idw_from_neighbors(
    nn: DataFrame,
    values: DataFrame,
    dist_col: str,
    *,
    power: float,
    eps: float,
    out_col: str,
) -> DataFrame:
    """(q_id, idw) from a ranked neighbor set (q_id, r_id, dist, rank)
    joined to (r_id, val). The per-query fold is one JVM ``aggregate``
    over the rank-sorted struct array — deterministic order."""
    joined = nn.join(values, "r_id").select(
        "q_id",
        F.struct(
            F.col("rank").alias("rank"),
            F.col(dist_col).alias("dist"),
            F.col("val").alias("val"),
        ).alias("nbr"),
    )
    g = joined.groupBy("q_id").agg(
        F.sort_array(F.collect_list("nbr")).alias("nbrs")
    )
    acc0 = F.struct(
        F.lit(0.0).alias("num"),
        F.lit(0.0).alias("den"),
        F.lit(None).cast("double").alias("hit"),
    )

    def step(acc, n):
        w = F.lit(1.0) / F.pow(F.greatest(n["dist"], F.lit(eps)), F.lit(power))
        return F.struct(
            (acc["num"] + w * n["val"]).alias("num"),
            (acc["den"] + w).alias("den"),
            # exact hit: first (lowest-rank ⇒ smallest id among
            # zero-distance ties) neighbor at distance 0 wins
            F.when(
                acc["hit"].isNotNull(), acc["hit"]
            ).when(n["dist"] == 0.0, n["val"]).alias("hit"),
        )

    fin = F.aggregate(
        F.col("nbrs"),
        acc0,
        step,
        lambda acc: F.coalesce(acc["hit"], acc["num"] / acc["den"]),
    )
    return g.select("q_id", fin.alias(out_col))


def idw_interpolate(
    queries: DataFrame,
    samples: DataFrame,
    k: int,
    cfg,
    *,
    value_col: str = "val",
    power: float = 2.0,
    eps: float = 1e-12,
) -> DataFrame:
    """Planar IDW: (q_id, idw) for every query point (id, x, y) from
    the k nearest samples (id, x, y, value_col) under the exact grid
    kNN join (Euclidean, strict FFCL result-set semantics)."""
    from ffcl_spark.operators.knn_kernel import knn_join_grid
    from ffcl_spark.plans.cache import carry

    nn = knn_join_grid(
        queries.select("id", "x", "y"), samples.select("id", "x", "y"), k, cfg
    )
    vals = samples.select(
        F.col("id").alias("r_id"), F.col(value_col).cast("double").alias("val")
    )
    out = _idw_from_neighbors(
        nn, vals, "dist", power=power, eps=eps, out_col="idw"
    )
    return carry(out, nn)


def geo_idw(
    queries: DataFrame,
    samples: DataFrame,
    k: int,
    *,
    value_col: str = "val",
    power: float = 2.0,
    eps: float = 1e-6,
    lat_col: str = "lat",
    lon_col: str = "lon",
    plan: str = "sphere",
    **knn_kwargs,
) -> DataFrame:
    """Geodesic IDW: (q_id, idw) with distances in great-circle METRES
    via the exact spherical-grid kNN join — interpolate a worldwide
    station field (temperature, elevation, signal strength) at query
    coordinates with no planar distortion. ``eps`` is in metres (the
    weight cap for near-coincident, non-identical coordinates); exact
    coordinate hits (dist 0) return the station value directly."""
    from ffcl_spark.operators.geo import geo_knn_join
    from ffcl_spark.plans.cache import carry

    nn = geo_knn_join(
        queries.select("id", lat_col, lon_col),
        samples.select("id", lat_col, lon_col),
        k,
        lat_col=lat_col,
        lon_col=lon_col,
        plan=plan,
        **knn_kwargs,
    )
    vals = samples.select(
        F.col("id").alias("r_id"), F.col(value_col).cast("double").alias("val")
    )
    out = _idw_from_neighbors(
        nn, vals, "dist_m", power=power, eps=eps, out_col="idw"
    )
    return carry(out, nn)
