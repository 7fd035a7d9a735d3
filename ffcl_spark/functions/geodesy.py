"""Great-circle construction functions as pure JVM column
expressions — the PostGIS ``ST_Azimuth`` / ``ST_Project`` /
``ST_LineInterpolatePoint`` surface for the engine's geodesic family.

Everything here is a handful of trig expressions inside whole-stage
codegen: map-only, no shuffle, no Python per row. The NumPy twin for
``destination`` already exists (``kernels/geo.destination_point_np``,
the fixture generator); tests pin each function against its twin to
float tolerance (JVM libm and NumPy agree to ~1 ulp on trig, not
bitwise — same contract as ``haversine_m``).

The reference is metric-generic (``Distances.hpp:44-117``) and ships
no geodesy; these constructions are the engine's geospatial-tier
extension alongside :mod:`ffcl_spark.operators.geo`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def initial_bearing(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Forward azimuth at the start of the great circle from point 1
    to point 2, degrees clockwise from north in ``[0, 360)`` (the
    ``ST_Azimuth`` convention). NULL-propagating; the bearing at a
    pole or between coincident points follows atan2(0, 0) = 0."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2) - F.radians(lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    return F.pmod(F.degrees(F.atan2(y, x)), F.lit(360.0))


def destination(
    lat: Column, lon: Column, bearing_deg: Column, arc_deg: Column
) -> Column:
    """Travel ``arc_deg`` along the great circle leaving (lat, lon)
    with initial ``bearing_deg`` → ``struct<lat, lon>`` (degrees, lon
    normalized to [-180, 180)). The aviation forward formulae —
    column twin of ``kernels/geo.destination_point_np``."""
    phi1 = F.radians(lat)
    lam1 = F.radians(lon)
    th = F.radians(bearing_deg)
    d = F.radians(arc_deg)
    sphi2 = F.sin(phi1) * F.cos(d) + F.cos(phi1) * F.sin(d) * F.cos(th)
    sphi2 = F.when(sphi2 > 1.0, F.lit(1.0)).otherwise(
        F.when(sphi2 < -1.0, F.lit(-1.0)).otherwise(sphi2)
    )
    phi2 = F.asin(sphi2)
    lam2 = lam1 + F.atan2(
        F.sin(th) * F.sin(d) * F.cos(phi1),
        F.cos(d) - F.sin(phi1) * sphi2,
    )
    lon2 = F.pmod(F.degrees(lam2) + 180.0, F.lit(360.0)) - 180.0
    return F.struct(
        F.degrees(phi2).alias("lat"), lon2.alias("lon")
    )


def gc_interpolate(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, f: Column
) -> Column:
    """Point a fraction ``f`` ∈ [0, 1] along the minor great-circle
    arc from point 1 to point 2 → ``struct<lat, lon>`` (the
    ``ST_LineInterpolatePoint`` analogue; spherical linear
    interpolation on the unit-vector embedding). Antipodal endpoints
    (sin Δ = 0 at Δ = π) have no unique arc — the expression returns
    point 1's meridian plane resolution of atan2(0, 0); coincident
    endpoints return the point itself exactly at any ``f`` (the
    f-weights degrade to (1-f, f) on identical vectors only when
    sin Δ > 0; at Δ = 0 the fallback branch keeps point 1)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    l1, l2 = F.radians(lon1), F.radians(lon2)
    # unit vectors
    x1, y1, z1 = F.cos(p1) * F.cos(l1), F.cos(p1) * F.sin(l1), F.sin(p1)
    x2, y2, z2 = F.cos(p2) * F.cos(l2), F.cos(p2) * F.sin(l2), F.sin(p2)
    dot = x1 * x2 + y1 * y2 + z1 * z2
    dot = F.when(dot > 1.0, F.lit(1.0)).otherwise(
        F.when(dot < -1.0, F.lit(-1.0)).otherwise(dot)
    )
    delta = F.acos(dot)
    sd = F.sin(delta)
    a = F.when(sd > 0, F.sin((1.0 - f) * delta) / sd).otherwise(1.0 - f)
    b = F.when(sd > 0, F.sin(f * delta) / sd).otherwise(f)
    x, y, z = a * x1 + b * x2, a * y1 + b * y2, a * z1 + b * z2
    r = F.sqrt(x * x + y * y + z * z)
    lat_o = F.degrees(F.asin(
        F.when(z / r > 1.0, F.lit(1.0))
        .when(z / r < -1.0, F.lit(-1.0))
        .otherwise(z / r)
    ))
    lon_o = F.degrees(F.atan2(y, x))
    return F.struct(lat_o.alias("lat"), lon_o.alias("lon"))


def gc_midpoint(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Midpoint of the minor great-circle arc — ``gc_interpolate`` at
    f = 1/2 (normalized chord midpoint; exact on the sphere)."""
    return gc_interpolate(lat1, lon1, lat2, lon2, F.lit(0.5))
