"""Latitude-band spherical grid (S2/H3-style discretization, in the
engine's own packed-BIGINT idiom — ``functions/cells.py`` for the
sphere).

Why a dedicated spherical grid: the 3-D unit-vector embedding makes
great-circle search *correct* through the planar n-D machinery, but
its 2-axis projected grid collapses the sphere to a disk — every
projected cell holds BOTH hemisphere sheets, and cells near the rim
hold entire z-columns of points, so candidate volume explodes at
corpus scale (measured: the 913k-point geodesic radius join never
finished at resolution 4; see BENCH/BASELINE.md round-5 note). The
grid here lives ON the sphere, so cell occupancy is bounded by true
surface density — the property H3/S2 provide, built from two column
expressions instead of a native library.

Layout: latitude bands of height ``delta_deg``; band ``b`` spans
``[b·δ − 90, (b+1)·δ − 90)``. Each band is split into
``m(b) = max(1, ceil(360·cos_max(b)/δ))`` longitude cells, where
``cos_max(b)`` is the largest cos(lat) inside the band — so every
cell's east-west great-circle extent is ≤ δ at its widest edge, and
polar bands degrade gracefully to a single cap cell. The cell id
packs ``(band, lon_cell)`` into one BIGINT (band in the high 32
bits). Everything is a deterministic JVM column expression — the same
``m(b)`` tree is evaluated in the assignment and the cover, so they
can never disagree.

Cover for a radius-r query at (φ, λ): bands ``⌊(φ−r+90)/δ⌋ ..
⌊(φ+r+90)/δ⌋`` (clamped), and within each band the longitude cells
spanning ``λ ± Δλ`` where ``Δλ = asin(sin r / cos φ)`` — the exact
spherical-cap bounding meridian (`Ball.hpp:91-97`'s ball bound, on
the sphere). Caps that contain a pole (``|φ| + r ≥ 90``) take the
full circle; the per-band sequence is capped at ``m(b)`` cells so a
full wrap never duplicates a key. Antimeridian wrap is a ``pmod``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# band index occupies the high bits; 2^32 longitude cells is enough
# for delta_deg down to ~1e-7 degrees (centimetre cells).
_BAND_SHIFT = 1 << 32


def n_bands(delta_deg: float) -> int:
    return max(1, math.ceil(180.0 / delta_deg))


def _cos_max(band: Column, delta_deg: float) -> Column:
    """Largest cos(lat) within the band (1.0 if it straddles the
    equator) — the widest-edge scale for the band's lon cells."""
    lat_lo = band.cast("double") * F.lit(delta_deg) - F.lit(90.0)
    lat_hi = lat_lo + F.lit(delta_deg)
    return F.when((lat_lo < 0) & (lat_hi > 0), F.lit(1.0)).otherwise(
        F.cos(F.radians(F.least(F.abs(lat_lo), F.abs(lat_hi))))
    )


def _m_of_band(band: Column, delta_deg: float) -> Column:
    """Number of longitude cells in the band (≥ 1; polar caps → 1)."""
    return F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.lit(360.0) * _cos_max(band, delta_deg) / F.lit(delta_deg)),
    )


def band_of(lat: Column, delta_deg: float) -> Column:
    b = n_bands(delta_deg)
    return F.least(
        F.lit(b - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((lat + F.lit(90.0)) / F.lit(delta_deg)),
        ),
    )


def sphere_cell(lat: Column, lon: Column, delta_deg: float) -> Column:
    """(lat°, lon°) → packed BIGINT spherical cell id."""
    bb = band_of(lat, delta_deg)
    m = _m_of_band(bb, delta_deg)
    j = F.least(
        m - 1,
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((lon + F.lit(180.0)) * m.cast("double") / F.lit(360.0)),
        ),
    )
    return bb * F.lit(_BAND_SHIFT) + j


def band_m_table(delta_deg: float) -> list[int]:
    """Per-band longitude cell counts, computed ONCE in Python — the
    driver-shared twin of :func:`_m_of_band`. Operators that must
    agree between a Python-side cover and a JVM-side cell assignment
    (the geodesic PIP join) derive BOTH from this one table, so a
    1-ulp libm-vs-JVM cos difference at a ceil boundary can never
    split the grid topology between the two sides."""
    out = []
    for band in range(n_bands(delta_deg)):
        lat_lo = band * delta_deg - 90.0
        lat_hi = lat_lo + delta_deg
        cos_max = (
            1.0
            if (lat_lo < 0.0 and lat_hi > 0.0)
            else math.cos(math.radians(min(abs(lat_lo), abs(lat_hi))))
        )
        out.append(max(1, math.ceil(360.0 * cos_max / delta_deg)))
    return out


def sphere_cell_table(
    lat: Column, lon: Column, delta_deg: float, m_table: list[int]
) -> Column:
    """(lat°, lon°) → packed BIGINT cell id with the band widths taken
    from a literal ``band_m_table`` array (same packing as
    :func:`sphere_cell`; the table form exists so a Python cover can
    be guaranteed topology-identical)."""
    bb = band_of(lat, delta_deg)
    m = F.element_at(F.lit(m_table), (bb + 1).cast("int")).cast("long")
    j = F.least(
        m - 1,
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((lon + F.lit(180.0)) * m.cast("double") / F.lit(360.0)),
        ),
    )
    return bb * F.lit(_BAND_SHIFT) + j


def cover_cells_py(
    lat: float, lon: float, r_deg: float, delta_deg: float, m_table: list[int]
) -> set[int]:
    """Python twin of :func:`cover_cells` against a ``band_m_table``
    grid, padded by one extra band and one extra longitude cell per
    side so floating-point disagreement with the JVM floors can only
    ever WIDEN the cover (superset is the correctness requirement;
    tightness is only a constant-factor candidate cost)."""
    nb = len(m_table)
    b_lo = max(0, math.floor((lat - r_deg + 90.0) / delta_deg) - 1)
    b_hi = min(nb - 1, math.floor((lat + r_deg + 90.0) / delta_deg) + 1)
    if abs(lat) + r_deg >= 90.0 - 1e-9 or r_deg >= 90.0:
        dl = 180.0
    else:
        s = math.sin(math.radians(r_deg)) / math.cos(math.radians(lat))
        dl = math.degrees(math.asin(min(1.0, s))) * (1 + 1e-9) + 1e-9
    cells: set[int] = set()
    for band in range(b_lo, b_hi + 1):
        m = m_table[band]
        j_lo = math.floor((lon - dl + 180.0) * m / 360.0) - 1
        j_hi = min(math.floor((lon + dl + 180.0) * m / 360.0) + 1, j_lo + m - 1)
        for j in range(j_lo, j_hi + 1):
            cells.add(band * _BAND_SHIFT + (j % m))
    return cells


def cover_cells(lat: Column, lon: Column, r_deg: float, delta_deg: float) -> Column:
    """array<bigint> of every spherical cell that can contain a point
    within great-circle arc ``r_deg`` of (lat, lon) — the a-priori
    Chebyshev-style cover, exact cap bounds, no ring expansion."""
    b = n_bands(delta_deg)
    b_lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor((lat - F.lit(r_deg) + F.lit(90.0)) / F.lit(delta_deg)),
    )
    b_hi = F.least(
        F.lit(b - 1).cast("long"),
        F.floor((lat + F.lit(r_deg) + F.lit(90.0)) / F.lit(delta_deg)),
    )
    # exact spherical-cap meridian bound; full circle when the cap
    # contains a pole (or r itself reaches a hemisphere)
    dl = F.when(
        (F.abs(lat) + F.lit(r_deg) >= F.lit(90.0)) | (F.lit(r_deg) >= F.lit(90.0)),
        F.lit(180.0),
    ).otherwise(
        F.degrees(
            F.asin(
                F.least(
                    F.lit(1.0),
                    F.lit(math.sin(math.radians(r_deg))) / F.cos(F.radians(lat)),
                )
            )
        )
    )

    def _band_cells(bb: Column) -> Column:
        m = _m_of_band(bb, delta_deg)
        j_lo = F.floor((lon - dl + F.lit(180.0)) * m.cast("double") / F.lit(360.0))
        j_hi = F.floor((lon + dl + F.lit(180.0)) * m.cast("double") / F.lit(360.0))
        # cap at one full wrap so pmod never emits a duplicate key
        j_hi = F.least(j_hi, j_lo + m - 1)
        return F.transform(
            F.sequence(j_lo, j_hi),
            lambda jj: bb * F.lit(_BAND_SHIFT) + F.pmod(jj, m),
        )

    return F.flatten(F.transform(F.sequence(b_lo, b_hi), _band_cells))


# --------------------------------------------------- cell API (H3/S2-style)


def cell_bounds(cell: Column, delta_deg: float) -> Column:
    """Packed cell id → ``struct<lat_lo, lat_hi, lon_lo, lon_hi>``
    (degrees; the cell's exact lat/lon rectangle — latitude-band cells
    ARE lat/lon rectangles, the grid's defining property). Column twin
    of the arithmetic inside :func:`sphere_cell`; the ``h3_cell_to_
    boundary`` analogue."""
    band = F.floor(cell / F.lit(_BAND_SHIFT))
    j = cell - band * F.lit(_BAND_SHIFT)
    m = _m_of_band(band, delta_deg).cast("double")
    lat_lo = band.cast("double") * F.lit(delta_deg) - F.lit(90.0)
    return F.struct(
        lat_lo.alias("lat_lo"),
        F.least(F.lit(90.0), lat_lo + F.lit(delta_deg)).alias("lat_hi"),
        (j.cast("double") * F.lit(360.0) / m - F.lit(180.0)).alias("lon_lo"),
        ((j.cast("double") + 1.0) * F.lit(360.0) / m - F.lit(180.0)).alias(
            "lon_hi"
        ),
    )


def cell_center(cell: Column, delta_deg: float) -> Column:
    """Packed cell id → ``struct<lat, lon>`` rectangle midpoint
    (degrees). ``sphere_cell(center) == cell`` for every cell — the
    round-trip the tests pin per level."""
    b = cell_bounds(cell, delta_deg)
    return F.struct(
        (F.least(b["lat_hi"], F.lit(90.0)) / 2 + b["lat_lo"] / 2).alias("lat"),
        ((b["lon_lo"] + b["lon_hi"]) / 2).alias("lon"),
    )


def cell_area_m2(
    cell: Column, delta_deg: float, earth_radius_m: float = 6_371_008.8
) -> Column:
    """EXACT spherical area of a cell in m² — Archimedes' hat-box:
    a latitude zone slice of angular width Δλ between latitudes φ1, φ2
    has area R²·Δλ·(sin φ2 − sin φ1), a closed form with no polygon
    approximation (the ``h3_cell_area`` analogue; sums to 4πR² per
    level, which the tests pin)."""
    b = cell_bounds(cell, delta_deg)
    band = F.floor(cell / F.lit(_BAND_SHIFT))
    m = _m_of_band(band, delta_deg).cast("double")
    dlam = F.lit(2.0 * math.pi) / m
    return (
        F.lit(earth_radius_m * earth_radius_m)
        * dlam
        * (F.sin(F.radians(b["lat_hi"])) - F.sin(F.radians(b["lat_lo"])))
    )


def cell_neighbors(cell: Column, delta_deg: float) -> Column:
    """array<bigint> of the cells edge- or corner-adjacent to ``cell``
    (its ring-1 neighborhood, self excluded) — the ``h3_grid_ring``
    analogue. Bands above/below have their OWN longitude split m(b),
    so a neighbor band contributes every cell whose CLOSED longitude
    interval [jj/m, (jj+1)/m] intersects the source's closed
    [j/m_src, (j+1)/m_src] — corner touches included, decided by the
    cross-multiplied integer inequalities (jj+1)·m_src ≥ j·m and
    jj·m_src ≤ (j+1)·m (the products stay ≤ a few 10⁵ for any sane δ,
    exact in doubles), so band topology can never split on a float.
    Pole bands wrap to a single cap cell; duplicates collapse through
    array_distinct."""
    nb = n_bands(delta_deg)
    band = F.floor(cell / F.lit(_BAND_SHIFT))
    j = cell - band * F.lit(_BAND_SHIFT)
    m_src = _m_of_band(band, delta_deg)

    def _band_cells(bb: Column) -> Column:
        m = _m_of_band(bb, delta_deg)
        # smallest jj with (jj+1)·m_src ≥ j·m is ceil(j·m/m_src) − 1;
        # largest jj with jj·m_src ≤ (j+1)·m is floor((j+1)·m/m_src)
        j_lo = F.floor((j * m + m_src - 1) / m_src) - 1
        j_hi = F.floor(((j + 1) * m) / m_src)
        j_hi = F.least(j_hi, j_lo + m - 1)
        return F.transform(
            F.sequence(j_lo, j_hi),
            lambda jj: bb * F.lit(_BAND_SHIFT) + F.pmod(jj, m),
        )

    bands = F.sequence(
        F.greatest(F.lit(0).cast("long"), band - 1),
        F.least(F.lit(nb - 1).cast("long"), band + 1),
    )
    ring = F.array_distinct(F.flatten(F.transform(bands, _band_cells)))
    return F.array_remove(ring, cell)
