"""Vectorized point-in-polygon (even-odd / ray-casting rule).

Engine-defined semantics (FIXTURES.md §4): a point counts as inside if
it is strictly inside or on the boundary of the polygon. Implemented
as the standard even-odd crossing test with an explicit on-edge check,
all NumPy-vectorized over (points × polygon edges) — this is the
pandas-UDF kernel for non-rectangular tiles; axis-aligned tiles use
plain column predicates instead (Catalyst-native, reference box search
``LowerBoundAndUpperBound.hpp:76-78``).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-12


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: point inside-or-on-boundary of polygon ``ring``
    (array of (x, y) vertices; closed or open — closure is implied)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    vx = np.asarray(ring, dtype=np.float64)[:, 0]
    vy = np.asarray(ring, dtype=np.float64)[:, 1]
    if vx[0] == vx[-1] and vy[0] == vy[-1] and len(vx) > 1:
        vx, vy = vx[:-1], vy[:-1]
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)

    pxe = px[:, None]
    pye = py[:, None]

    # on-edge test: collinear and within the segment bbox
    cross = (x2 - x1) * (pye - y1) - (y2 - y1) * (pxe - x1)
    within = (
        (pxe >= np.minimum(x1, x2) - EPS)
        & (pxe <= np.maximum(x1, x2) + EPS)
        & (pye >= np.minimum(y1, y2) - EPS)
        & (pye <= np.maximum(y1, y2) + EPS)
    )
    on_edge = (np.abs(cross) <= EPS) & within

    # even-odd ray cast toward +x
    cond = (y1 > pye) != (y2 > pye)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1 + (pye - y1) * (x2 - x1) / (y2 - y1)
    crossing = cond & (pxe < x_int)
    inside = (crossing.sum(axis=1) % 2) == 1
    return inside | on_edge.any(axis=1)
