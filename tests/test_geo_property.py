"""Property-based differential tests for the closing-session geodesic
kernels: random small inputs against independent pure-Python twins.
Kernel-level only (no SparkSession) — fast, wide input coverage the
fixture tests can't reach (duplicate timestamps, coincident points,
near-antipodal chains, single-ping entities)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ffcl_spark.kernels.geo import (
    discrete_frechet_rad,
    hausdorff_rad,
    stay_points_np,
    unit_vector_np,
)

lat = st.floats(-89.9, 89.9, allow_nan=False)
lon = st.floats(-180.0, 179.9, allow_nan=False)
chain = st.lists(st.tuples(lat, lon), min_size=1, max_size=6)


def _ang(a, b):
    u = unit_vector_np(np.array([a[0]]), np.array([a[1]]))[0]
    w = unit_vector_np(np.array([b[0]]), np.array([b[1]]))[0]
    return float(np.arctan2(np.linalg.norm(np.cross(u, w)), u @ w))


@settings(max_examples=150, deadline=None)
@given(chain, chain)
def test_hausdorff_matches_brute_and_bounds_frechet(a, b):
    A, B = np.array(a, float), np.array(b, float)
    h_ab, h_ba = hausdorff_rad(A, B)
    want_ab = max(min(_ang(p, q) for q in b) for p in a)
    want_ba = max(min(_ang(p, q) for p in a) for q in b)
    # matmul (BLAS) vs per-pair dot differ by ulps — 1e-12 on radians;
    # bitwise determinism holds WITHIN the kernel's own code path
    assert abs(h_ab - want_ab) < 1e-12 and abs(h_ba - want_ba) < 1e-12
    f = discrete_frechet_rad(A, B)
    assert max(h_ab, h_ba) <= f + 1e-12
    # frechet >= both endpoint couplings (forced)
    assert f >= _ang(a[0], b[0]) - 1e-12
    assert f >= _ang(a[-1], b[-1]) - 1e-12


@settings(max_examples=100, deadline=None)
@given(chain, chain)
def test_frechet_matches_recursive_twin(a, b):
    A, B = np.array(a, float), np.array(b, float)

    memo = {}

    def rec(i, j):
        if (i, j) in memo:
            return memo[(i, j)]
        d = _ang(a[i], b[j])
        if i == 0 and j == 0:
            r = d
        elif i == 0:
            r = max(rec(0, j - 1), d)
        elif j == 0:
            r = max(rec(i - 1, 0), d)
        else:
            r = max(min(rec(i - 1, j), rec(i - 1, j - 1), rec(i, j - 1)), d)
        memo[(i, j)] = r
        return r

    got = discrete_frechet_rad(A, B)
    want = rec(len(a) - 1, len(b) - 1)
    assert got == want or abs(got - want) < 1e-12


pings = st.lists(
    st.tuples(st.integers(0, 50), lat, lon), min_size=1, max_size=25
)


@settings(max_examples=150, deadline=None)
@given(
    pings,
    st.floats(1e4, 1e7),
    st.floats(0.0, 60.0),
)
def test_stay_points_matches_python_twin(p, radius_m, min_dur):
    from ffcl_spark.kernels.geo import EARTH_RADIUS_M

    p = sorted((float(t), la, lo) for t, la, lo in p)
    latlon = np.array([(la, lo) for _, la, lo in p], float)
    ts = np.array([t for t, _, _ in p], float)
    got = stay_points_np(latlon, ts, radius_m / EARTH_RADIUS_M, min_dur)

    # independent sequential twin (per-pair angles, plain loops)
    n, i, want = len(p), 0, []
    while i < n:
        j = i + 1
        while j < n and _ang(p[i][1:], p[j][1:]) < radius_m / EARTH_RADIUS_M:
            j += 1
        if j == i + 1:
            i += 1
            continue
        if ts[j - 1] - ts[i] >= min_dur:
            want.append((i, j - 1))
            i = j
        else:
            i += 1
    assert got == want
    # invariants: windows disjoint, ordered, every window inside its ball
    for (a1, b1), (a2, b2) in zip(got, got[1:]):
        assert b1 < a2
    for a1, b1 in got:
        assert ts[b1] - ts[a1] >= min_dur
        for k in range(a1, b1 + 1):
            assert _ang(p[a1][1:], p[k][1:]) < radius_m / EARTH_RADIUS_M
