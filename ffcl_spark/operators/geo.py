"""Geodesic (great-circle) spatial search over (lat, lon) columns.

The reference engine is metric-generic (``Distances.hpp:44-117`` takes
any pairwise kernel) but only ships planar metrics; a geospatial tile
engine needs the sphere. Rather than porting a lat/lon-aware grid with
antimeridian and pole special cases, the engine reduces the sphere to
the n-D machinery it already trusts:

    (lat, lon)  →  unit vector (cos φ cos λ, cos φ sin λ, sin φ)

Chord distance on the embedded points is STRICTLY MONOTONE with
great-circle distance (gc = 2·R·asin(chord/2)), so

- geodesic kNN  == 3-D Euclidean kNN over the embedding
  (:func:`ffcl_spark.operators.search_nd.knn_join_nd` — the proven
  ring-expansion/blocked plans, exact, ties by r_id preserved);
- geodesic radius r == 3-D radius 2·sin(r/2R) over the embedding
  (:func:`radius_join_nd` — a-priori Chebyshev cell cover, hot-cell
  salting).

Longitude wrap-around and pole adjacency come FREE: points straddling
the ±180° meridian or clustered at a pole are near each other in the
3-D embedding, so the projected grid covers them with no special
cases. The embedding is three map-side JVM trig expressions — no
Python per row, no extra shuffle.

Boundary caveat (documented contract): the radius predicate is
evaluated on chord floats, so a pair whose great-circle distance sits
within ~1 ulp of ``radius_m`` may land on either side — same
float-boundary contract as every planar radius join in the engine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffcl_spark.config import EngineConfig
from ffcl_spark.operators.search_nd import knn_join_nd, radius_join_nd

# IUGG mean Earth radius, metres.
EARTH_RADIUS_M = 6_371_008.8

# The embedding lives in [-1, 1]^3; the grid covers it with headroom.
GEO_CFG = EngineConfig(x0=-1.024, y0=-1.024, domain=2.048, resolution=4)


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column,
    radius_m: float = EARTH_RADIUS_M,
) -> Column:
    """Great-circle distance in metres as a pure column expression."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    sp = F.sin((p2 - p1) / 2)
    sl = F.sin((F.radians(lon2) - F.radians(lon1)) / 2)
    h = sp * sp + F.cos(p1) * F.cos(p2) * sl * sl
    # clamp: float fold can land an antipodal h at 1 + 1ulp → NaN asin
    return F.lit(2.0 * radius_m) * F.asin(F.sqrt(F.least(F.lit(1.0), h)))


def unit_vector(lat: Column, lon: Column) -> Column:
    """(lat°, lon°) → unit sphere embedding, ``array<double>``."""
    phi = F.radians(lat)
    lam = F.radians(lon)
    return F.array(
        F.cos(phi) * F.cos(lam), F.cos(phi) * F.sin(lam), F.sin(phi)
    )


def geo_points(
    df: DataFrame, id_col: str = "id", lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """(id, features) embedding view consumed by the n-D operators."""
    return df.select(
        F.col(id_col).alias("id"),
        unit_vector(F.col(lat_col), F.col(lon_col)).alias("features"),
    )


def chord_of_arc(radius_m: float, earth_radius_m: float = EARTH_RADIUS_M) -> float:
    """Chord length on the unit sphere subtending a ``radius_m`` arc.
    Arcs ≥ half the circumference cover every pair: return a bound
    strictly above the max chord 2 so the strict ``<`` keeps them."""
    half = radius_m / (2.0 * earth_radius_m)
    if half >= math.pi / 2:
        return 2.0 + 1e-9
    return 2.0 * math.sin(half)


def arc_of_chord_m(chord: Column, earth_radius_m: float = EARTH_RADIUS_M) -> Column:
    """Unit-sphere chord column → great-circle metres."""
    return F.lit(2.0 * earth_radius_m) * F.asin(F.least(F.lit(1.0), chord / 2))


def geo_radius_join(
    queries: DataFrame,
    refs: DataFrame,
    radius_m: float,
    cfg: EngineConfig = GEO_CFG,
    lat_col: str = "lat",
    lon_col: str = "lon",
    earth_radius_m: float = EARTH_RADIUS_M,
    salt_hot_cells: bool = True,
) -> DataFrame:
    """All (q_id, r_id, dist_m) with great-circle dist < radius_m
    (strict — FFCL ``Ball.hpp:91-97`` semantics on the sphere).

    One shuffle on the projected cell key of the 3-D embedding; the
    chord bound is known a priori so the Chebyshev ring cover is
    computed once on the driver, exactly like the planar plan."""
    chord = chord_of_arc(radius_m, earth_radius_m)
    out = radius_join_nd(
        geo_points(queries, lat_col=lat_col, lon_col=lon_col),
        geo_points(refs, lat_col=lat_col, lon_col=lon_col),
        chord,
        cfg,
        salt_hot_cells=salt_hot_cells,
    )
    return out.select(
        "q_id", "r_id", arc_of_chord_m(F.col("dist"), earth_radius_m).alias("dist_m")
    )


def geo_knn_join(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    cfg: EngineConfig = GEO_CFG,
    lat_col: str = "lat",
    lon_col: str = "lon",
    earth_radius_m: float = EARTH_RADIUS_M,
    **knn_kwargs,
) -> DataFrame:
    """Exact geodesic kNN join (q_id, r_id, dist_m, rank).

    Rank order under chord == rank order under great-circle distance
    (strict monotonicity), ties broken by r_id in both framings — so
    the planar kNN result-set contract (k smallest, deterministic
    ties, self included when queries ⊆ refs) transfers verbatim."""
    out = knn_join_nd(
        geo_points(queries, lat_col=lat_col, lon_col=lon_col),
        geo_points(refs, lat_col=lat_col, lon_col=lon_col),
        k,
        cfg,
        **knn_kwargs,
    )
    return out.select(
        "q_id",
        "r_id",
        arc_of_chord_m(F.col("dist"), earth_radius_m).alias("dist_m"),
        "rank",
    )


def geo_box_search(
    points: DataFrame,
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All points inside a lat/lon box, bounds inclusive.

    ``lon_lo > lon_hi`` means the box crosses the antimeridian (e.g.
    170 → -170 spans the Pacific): the longitude predicate becomes a
    disjunction of two ranges. Both forms are plain Catalyst
    predicates, pushed to the parquet scan."""
    lat_ok = F.col(lat_col).between(lat_lo, lat_hi)
    if lon_lo <= lon_hi:
        lon_ok = F.col(lon_col).between(lon_lo, lon_hi)
    else:
        lon_ok = (F.col(lon_col) >= lon_lo) | (F.col(lon_col) <= lon_hi)
    return points.where(lat_ok & lon_ok)
