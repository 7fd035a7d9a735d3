"""Vectorized polygon-polygon intersection test (overlay kernel).

Two simple polygons intersect (share at least one point, boundary or
interior) iff
  (a) some edge of A intersects some edge of B, or
  (b) a vertex of A lies inside B (A ⊆ B case), or
  (c) a vertex of B lies inside A (B ⊆ A case).
Edge-edge intersection uses the orientation-straddle test with an
explicit collinear-overlap branch, vectorized over the full
(edges(A) × edges(B)) grid — NumPy only, the Arrow-batch kernel of
``operators.tiles.overlay_join``. Same boundary semantics as the PIP
kernel (on-boundary counts, tolerance ``EPS``).

Also the shoelace measures (``ring_area``/``ring_centroid``) used by
the column-expression twins in ``operators.tiles``.
"""

from __future__ import annotations

import numpy as np

from ffcl_spark.kernels.pip import points_in_polygon

EPS = 1e-12


def _edges(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
        r = r[:-1]
    x1, y1 = r[:, 0], r[:, 1]
    return x1, y1, np.roll(x1, -1), np.roll(y1, -1)


def segments_cross(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Boolean grid [|A| edges, |B| edges]: segments share a point
    (proper crossing, T-touch, endpoint touch, or collinear overlap)."""
    ax1, ay1, ax2, ay2 = (v[:, None] for v in (ax1, ay1, ax2, ay2))
    bx1, by1, bx2, by2 = (v[None, :] for v in (bx1, by1, bx2, by2))

    def orient(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = (
        (((d1 > EPS) & (d2 < -EPS)) | ((d1 < -EPS) & (d2 > EPS)))
        & (((d3 > EPS) & (d4 < -EPS)) | ((d3 < -EPS) & (d4 > EPS)))
    )

    def on_seg(sx1, sy1, sx2, sy2, px, py, d):
        return (
            (np.abs(d) <= EPS)
            & (px >= np.minimum(sx1, sx2) - EPS)
            & (px <= np.maximum(sx1, sx2) + EPS)
            & (py >= np.minimum(sy1, sy2) - EPS)
            & (py <= np.maximum(sy1, sy2) + EPS)
        )

    touch = (
        on_seg(ax1, ay1, ax2, ay2, bx1, by1, d1)
        | on_seg(ax1, ay1, ax2, ay2, bx2, by2, d2)
        | on_seg(bx1, by1, bx2, by2, ax1, ay1, d3)
        | on_seg(bx1, by1, bx2, by2, ax2, ay2, d4)
    )
    return proper | touch


def polys_intersect(ring_a: np.ndarray, ring_b: np.ndarray) -> bool:
    """True iff the two simple polygons share at least one point."""
    ax1, ay1, ax2, ay2 = _edges(ring_a)
    bx1, by1, bx2, by2 = _edges(ring_b)
    if segments_cross(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2).any():
        return True
    if points_in_polygon(ax1[:1], ay1[:1], np.asarray(ring_b, dtype=np.float64))[0]:
        return True  # A inside B
    return bool(
        points_in_polygon(bx1[:1], by1[:1], np.asarray(ring_a, dtype=np.float64))[0]
    )  # B inside A


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise ring)."""
    x1, y1, x2, y2 = _edges(ring)
    return float(np.sum(x1 * y2 - x2 * y1) / 2.0)


def ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area centroid of a simple polygon (shoelace moments)."""
    x1, y1, x2, y2 = _edges(ring)
    cross = x1 * y2 - x2 * y1
    a = np.sum(cross) / 2.0
    cx = float(np.sum((x1 + x2) * cross) / (6.0 * a))
    cy = float(np.sum((y1 + y2) * cross) / (6.0 * a))
    return cx, cy
