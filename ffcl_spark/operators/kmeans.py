"""Distributed k-means (Lloyd) — reference semantics.

Reference ``Lloyd.hpp:91-166``: assign → per-cluster position sum →
divide by count; an empty cluster keeps its previous centroid
(``Lloyd.hpp:114-118``). Init = kmeans++ (``KMeansPlusPlus.hpp:40-65``)
on a seeded driver sample; ``n_init`` restarts keep the min-loss run
(``KMeans.hpp:153-230``); early stop when every centroid moves less
than ``tol`` (``KMeans.hpp:202-215``).

Spark shape: centroids are a tiny literal array → the assignment is a
pure column expression (sort_array over (dist, cid) structs — JVM,
codegen); the update is one ``groupBy(label).agg(avg, count)`` with
automatic partial aggregation; the driver loop touches k rows per
iteration. Hamerly's per-row bound caching (``Hamerly.hpp``) is an
optimization the reference itself treats as optional — Lloyd is the
semantic contract (SURVEY.md §2.9).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeanspp_init(
    sample: np.ndarray, k: int, seed: int
) -> np.ndarray:
    """kmeans++ seeding on a local sample (reference
    ``KMeansPlusPlus.hpp:40-65``): first centroid uniform, then
    D²-weighted picks. Deterministic under the seed."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cents = [sample[int(rng.integers(n))]]
    for _ in range(1, min(k, n)):
        d2 = np.min(
            [np.sum((sample - c) ** 2, axis=1) for c in cents], axis=0
        )
        total = d2.sum()
        if total == 0:
            cents.append(sample[int(rng.integers(n))])
            continue
        probs = d2 / total
        cents.append(sample[int(rng.choice(n, p=probs))])
    return np.array(cents, dtype=np.float64)


def kmeanspp_init_from_previous(
    sample: np.ndarray, k: int, seed: int
) -> np.ndarray:
    """The reference's second kmeans++ flavor
    (``KMeansPlusPlus.hpp:83-112``,
    ``make_centroids_from_previous_centroid``): first centroid uniform;
    each subsequent centroid is drawn with probability proportional to
    the euclidean distance to the PREVIOUS centroid only (not the min
    over all picked centroids), via Vose's alias method
    (``VosesAliasMethod.hpp:16-50`` → ``kernels.sampling.VoseAlias``).
    Cheaper per pick (one distance column instead of a running min);
    the reference documents the trade-off — more prone to local minima.
    Deterministic under the seed."""
    from ffcl_spark.kernels.sampling import VoseAlias

    rng = np.random.default_rng(seed)
    n = len(sample)
    prev = sample[int(rng.integers(n))]
    cents = [prev]
    for i in range(1, min(k, n)):
        d = np.sqrt(np.sum((sample - prev) ** 2, axis=1))
        if d.sum() <= 0:  # all samples identical to prev: uniform pick
            idx = int(rng.integers(n))
        else:
            idx = int(VoseAlias(d, seed=seed + i).draw(1)[0])
        prev = sample[idx]
        cents.append(prev)
    return np.array(cents, dtype=np.float64)


_INITS = {"pp": kmeanspp_init, "pp_prev": kmeanspp_init_from_previous}


def _assign_expr(cents: np.ndarray):
    """Argmin-distance label as a pure column expression."""
    structs = [
        F.struct(
            (
                (F.col("x") - float(cx)) * (F.col("x") - float(cx))
                + (F.col("y") - float(cy)) * (F.col("y") - float(cy))
            ).alias("d2"),
            F.lit(ci).alias("cid"),
        )
        for ci, (cx, cy) in enumerate(cents)
    ]
    return F.sort_array(F.array(*structs))[0]


def lloyd_once(
    points: DataFrame,
    init: np.ndarray,
    max_iters: int,
    tol: float,
) -> tuple[np.ndarray, float, DataFrame]:
    """One Lloyd run from ``init``. Returns (centroids, loss, labels)."""
    cents = init.copy()
    for _ in range(max_iters):
        best = _assign_expr(cents)
        agg = (
            points.select(best["cid"].alias("label"), "x", "y")
            .groupBy("label")
            .agg(F.avg("x").alias("mx"), F.avg("y").alias("my"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_cents = cents.copy()  # empty cluster keeps previous centroid
        for row in agg:
            new_cents[row["label"]] = (row["mx"], row["my"])
        move = float(np.max(np.sqrt(np.sum((new_cents - cents) ** 2, axis=1))))
        cents = new_cents
        if move < tol:
            break
    best = _assign_expr(cents)
    loss = points.select(F.sqrt(best["d2"]).alias("d")).agg(F.sum("d")).collect()[0][0]
    labels = points.select("id", _assign_expr(cents)["cid"].alias("label"))
    return cents, float(loss), labels


def kmeans(
    points: DataFrame,
    k: int,
    n_init: int = 1,
    max_iters: int = 20,
    tol: float = 1e-6,
    seed: int = 7,
    sample_rows: int = 50_000,
    init: str = "pp",
) -> tuple[np.ndarray, float, DataFrame]:
    """Full k-means: n_init kmeans++ restarts, keep the min-loss run.
    Returns (centroids, loss, labels DataFrame (id, label)).

    ``init``: "pp" = full kmeans++ (D-weighted against the nearest
    picked centroid, ``KMeansPlusPlus.hpp:40-65``); "pp_prev" = the
    reference's previous-centroid variant (weighted by distance to the
    last pick only, Vose alias draw — ``KMeansPlusPlus.hpp:83-112``).

    The init sample is a SEEDED HASH FILTER (pmod(xxhash64(id, seed),
    m) == 0) — deterministic at any partitioning/AQE plan, and never a
    global sort of the full table (a total orderBy to seed centroids
    is a scale-killer at 100×). The filtered sample is sorted locally
    so the kmeans++ draw order is stable."""
    n = points.count()
    m = max(1, math.ceil(n / sample_rows))
    basis = points
    if m > 1:
        basis = points.where(
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(m)) == 0
        )
    sample = (
        basis.select("x", "y")
        .toPandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
        .to_numpy()[:sample_rows]
    )
    init_fn = _INITS[init]
    best = None
    for trial in range(n_init):
        cents0 = init_fn(sample, k, seed + trial)
        cents, loss, labels = lloyd_once(points, cents0, max_iters, tol)
        if best is None or loss < best[1]:
            best = (cents, loss, labels)
    return best


def _full_assign_expr(cents: np.ndarray):
    """Sorted (d, cid) structs over all k centroids — [0] = assignment
    + exact upper bound, [1] = exact lower bound (second closest)."""
    structs = []
    for ci, (cx, cy) in enumerate(cents):
        d = F.sqrt(
            (F.col("x") - float(cx)) * (F.col("x") - float(cx))
            + (F.col("y") - float(cy)) * (F.col("y") - float(cy))
        )
        structs.append(F.named_struct(F.lit("d"), d, F.lit("cid"), F.lit(ci)))
    return F.sort_array(F.array(*structs))


def hamerly_once(
    points: DataFrame,
    init: np.ndarray,
    max_iters: int,
    tol: float,
) -> tuple[np.ndarray, float, DataFrame]:
    """Hamerly's exact accelerated k-means (reference ``Hamerly.hpp``:
    one upper bound u = d(x, c_assigned) and one lower bound
    l = d(x, second closest) per point; a point whose
    u ≤ max(s_assigned, l) provably keeps its assignment, where
    s_j = ½·min_{i≠j} d(c_j, c_i)).

    Produces the IDENTICAL (assignment, centroid) sequence as Lloyd
    from the same init — the bounds only skip distance work, never
    change results (pytest-pinned against ``lloyd_once``).

    Spark shape: per-point state (label, u, l) is a persisted column
    set updated by ROW-LOCAL expressions — the skip/tighten/rescan
    三-way decision is a nested CASE WHEN, which whole-stage codegen
    evaluates lazily per row, so the k-distance full scan truly runs
    only for rows whose bounds fail (the same work-saving as the
    reference's sequential loop, minus its per-point branch
    bookkeeping). One groupBy(label) aggregation per iteration updates
    centroids; the driver touches k rows."""
    cents = init.copy()
    k = len(cents)
    arr = _full_assign_expr(cents)
    state = points.select(
        "id",
        "x",
        "y",
        arr[0]["cid"].alias("label"),
        arr[0]["d"].alias("u"),
        arr[1]["d"].alias("l"),
    ).localCheckpoint()

    for _ in range(max_iters):
        # centroid update from current assignment (empty keeps old —
        # Lloyd.hpp:114-118)
        agg = (
            state.groupBy("label")
            .agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
            .collect()
        )
        new_cents = cents.copy()
        for row in agg:
            new_cents[row["label"]] = (row["mx"], row["my"])
        moves = np.sqrt(np.sum((new_cents - cents) ** 2, axis=1))
        cents = new_cents
        if float(moves.max()) < tol:
            break
        # Hamerly bound maintenance: u += p(assigned), l -= max move
        s = np.full(k, np.inf)
        for j in range(k):
            for i in range(k):
                if i != j:
                    s[j] = min(s[j], float(np.sqrt(np.sum((cents[j] - cents[i]) ** 2))))
        s *= 0.5
        p_arr = F.array(*[F.lit(float(v)) for v in moves])
        s_arr = F.array(*[F.lit(float(v)) for v in s])
        u1 = F.col("u") + F.element_at(p_arr, F.col("label") + 1)
        l1 = F.col("l") - F.lit(float(moves.max()))
        bound = F.greatest(F.element_at(s_arr, F.col("label") + 1), l1)
        # tightened upper bound: exact distance to the (moved) assigned
        # centroid — evaluated only when the cheap bound fails
        tight_structs = _full_assign_expr(cents)
        cx = F.array(*[F.lit(float(c[0])) for c in cents])
        cy = F.array(*[F.lit(float(c[1])) for c in cents])
        dx = F.col("x") - F.element_at(cx, F.col("label") + 1)
        dy = F.col("y") - F.element_at(cy, F.col("label") + 1)
        u_tight = F.sqrt(dx * dx + dy * dy)
        keep1 = u1 <= bound
        keep2 = u_tight <= bound
        new_state = state.select(
            "id",
            "x",
            "y",
            F.when(keep1, F.col("label"))
            .when(keep2, F.col("label"))
            .otherwise(tight_structs[0]["cid"])
            .alias("label"),
            F.when(keep1, u1)
            .when(keep2, u_tight)
            .otherwise(tight_structs[0]["d"])
            .alias("u"),
            F.when(keep1 | keep2, l1)
            .otherwise(tight_structs[1]["d"])
            .alias("l"),
        ).localCheckpoint()
        state = new_state

    # recompute labels under the FINAL centroids — the tol-convergence
    # break leaves `state` holding the assignment under the previous
    # centroids, while the loss below uses the final ones; Lloyd's
    # contract (lloyd_once) is labels-under-final-centroids, exact
    # distance ties to the smaller cid (ADVICE round-2 fix)
    arr = _full_assign_expr(cents)
    loss = points.select(arr[0]["d"].alias("d")).agg(F.sum("d")).collect()[0][0]
    labels = points.select("id", arr[0]["cid"].alias("label"))
    return cents, float(loss), labels


def kmeans_hamerly(
    points: DataFrame,
    k: int,
    n_init: int = 1,
    max_iters: int = 20,
    tol: float = 1e-6,
    seed: int = 7,
    sample_rows: int = 50_000,
    init: str = "pp",
) -> tuple[np.ndarray, float, DataFrame]:
    """k-means with Hamerly's acceleration — same contract and results
    as :func:`kmeans` (kmeans++ seeded init with the same ``init``
    flavors, n_init restarts, min-loss run kept); reference
    ``Hamerly.hpp`` (the reference treats it as a drop-in engine for
    the same KMeans pipeline, ``KMeans.hpp``)."""
    n = points.count()
    m = max(1, math.ceil(n / sample_rows))
    basis = points
    if m > 1:
        basis = points.where(
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(m)) == 0
        )
    sample = (
        basis.select("x", "y")
        .toPandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
        .to_numpy()[:sample_rows]
    )
    init_fn = _INITS[init]
    best = None
    for trial in range(n_init):
        cents0 = init_fn(sample, k, seed + trial)
        cents, loss, labels = hamerly_once(points, cents0, max_iters, tol)
        if best is None or loss < best[1]:
            best = (cents, loss, labels)
    return best


# --------------------------------------------------------------- n-D


def _assign_expr_nd(cents: np.ndarray, vec_col: str):
    """n-D argmin-distance label — JVM fold per centroid, no Python.
    Reference distance kernels are dimension-generic
    (``Distances.hpp:44-117``)."""
    v = F.col(vec_col)
    structs = []
    for ci, c in enumerate(cents):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # named_struct, not struct: alias-derived field names on
        # lambda-bearing expressions are unreliable under Catalyst
        # canonicalization (observed col1/col2 renames)
        structs.append(F.named_struct(F.lit("d2"), d2, F.lit("cid"), F.lit(ci)))
    return F.sort_array(F.array(*structs))[0]


def lloyd_once_nd(
    points: DataFrame,
    init: np.ndarray,
    max_iters: int,
    tol: float,
    vec_col: str = "features",
) -> tuple[np.ndarray, float, DataFrame]:
    """One n-D Lloyd run (``Lloyd.hpp:91-166`` semantics: assign →
    per-cluster per-dimension mean; empty cluster keeps its previous
    centroid). The update is one posexplode + groupBy(label, dim) —
    partial aggregation applies, the driver touches k·dims rows."""
    cents = init.copy()
    for _ in range(max_iters):
        best = _assign_expr_nd(cents, vec_col)
        agg = (
            points.select(
                best["cid"].alias("label"),
                F.posexplode(F.col(vec_col)).alias("pos", "val"),
            )
            .groupBy("label", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_cents = cents.copy()  # empty cluster keeps previous centroid
        for row in agg:
            new_cents[row["label"], row["pos"]] = row["m"]
        move = float(np.max(np.sqrt(np.sum((new_cents - cents) ** 2, axis=1))))
        cents = new_cents
        if move < tol:
            break
    best = _assign_expr_nd(cents, vec_col)
    loss = points.select(F.sqrt(best["d2"]).alias("d")).agg(F.sum("d")).collect()[0][0]
    labels = points.select("id", _assign_expr_nd(cents, vec_col)["cid"].alias("label"))
    return cents, float(loss), labels


def kmeans_nd(
    points: DataFrame,
    k: int,
    n_init: int = 1,
    max_iters: int = 20,
    tol: float = 1e-6,
    seed: int = 7,
    sample_rows: int = 50_000,
    vec_col: str = "features",
    init: str = "pp",
) -> tuple[np.ndarray, float, DataFrame]:
    """n-D k-means over an ``array<double>`` feature column — same
    contract as :func:`kmeans` (kmeans++ seeded on a deterministic
    hash-filtered sample with the same ``init`` flavors, n_init
    restarts, min-loss run kept)."""
    n = points.count()
    m = max(1, math.ceil(n / sample_rows))
    basis = points
    if m > 1:
        basis = points.where(
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(m)) == 0
        )
    pdf = basis.select("id", vec_col).toPandas().sort_values("id")
    sample = np.array(pdf[vec_col].tolist()[:sample_rows], dtype=np.float64)
    init_fn = _INITS[init]
    best = None
    for trial in range(n_init):
        cents0 = init_fn(sample, k, seed + trial)
        cents, loss, labels = lloyd_once_nd(points, cents0, max_iters, tol, vec_col)
        if best is None or loss < best[1]:
            best = (cents, loss, labels)
    return best
