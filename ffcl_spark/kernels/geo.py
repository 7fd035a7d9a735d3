"""NumPy twins of the geodesic column expressions (test oracles)."""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8


def haversine_np(
    lat1: np.ndarray,
    lon1: np.ndarray,
    lat2: np.ndarray,
    lon2: np.ndarray,
    radius_m: float = EARTH_RADIUS_M,
) -> np.ndarray:
    p1, p2 = np.radians(lat1), np.radians(lat2)
    sp = np.sin((p2 - p1) / 2)
    sl = np.sin((np.radians(lon2) - np.radians(lon1)) / 2)
    h = sp * sp + np.cos(p1) * np.cos(p2) * sl * sl
    return 2.0 * radius_m * np.arcsin(np.sqrt(np.minimum(1.0, h)))


def unit_vector_np(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    phi, lam = np.radians(lat), np.radians(lon)
    return np.stack(
        [np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)], axis=1
    )


def geo_brute_pairs(
    q_lat, q_lon, r_lat, r_lon, radius_m: float, earth_radius_m: float = EARTH_RADIUS_M
) -> np.ndarray:
    """Boolean matrix [n_q, n_r]: great-circle dist < radius_m (strict)."""
    d = haversine_np(
        np.asarray(q_lat)[:, None],
        np.asarray(q_lon)[:, None],
        np.asarray(r_lat)[None, :],
        np.asarray(r_lon)[None, :],
        earth_radius_m,
    )
    return d < radius_m


def geo_brute_knn(
    q_lat, q_lon, r_lat, r_lon, r_ids, k: int, earth_radius_m: float = EARTH_RADIUS_M
):
    """Exact geodesic kNN with (dist, id) ties — list of id arrays."""
    d = haversine_np(
        np.asarray(q_lat)[:, None],
        np.asarray(q_lon)[:, None],
        np.asarray(r_lat)[None, :],
        np.asarray(r_lon)[None, :],
        earth_radius_m,
    )
    r_ids = np.asarray(r_ids)
    out = []
    for row in d:
        order = np.lexsort((r_ids, row))[:k]
        out.append((r_ids[order], row[order]))
    return out
