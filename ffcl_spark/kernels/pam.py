"""Local k-medoids kernels: PAM BUILD init + FasterPAM eager swap.

Reference: ``PAMBuild.hpp:16-82`` (greedy BUILD — first medoid is the
sample minimizing total deviation, each next medoid maximizes the TD
reduction; NOTE the reference's selection comparator at
``PAMBuild.hpp:68`` minimizes the accumulated positive reduction,
which inverts the published BUILD step [Kaufman & Rousseeuw 1990;
Schubert & Rousseeuw 2019 Alg. 1] — this kernel follows the published
algorithm and maximizes the reduction) and ``FasterPAM.hpp:137-201``
(eager swap: for each non-medoid candidate x_c, ΔTD(x_c, m_i) is
computed for ALL medoids i in one O(n) sweep via nearest/second-nearest
buffers; the best (most negative) swap is applied immediately —
``step()`` applies swaps inside the candidate loop, not once per pass).

Deterministic: all argmin/argmax tie-breaks take the lowest index
(same as the reference's ``get_min_index_value_pair`` first-minimum),
and samples are pre-sorted by id by the callers.

Used as (a) the driver kernel of the CLARA-style distributed operator
(``operators.kmedoids``) and (b) the per-cell Arrow kernel — never in
a per-row Python path.
"""

from __future__ import annotations

import numpy as np


def distance_matrix(mat: np.ndarray, metric: str = "euclidean") -> np.ndarray:
    """Fold-order pairwise distances (bit-equal to the engine's SQL
    fold — see ``kernels.neighbors.pairwise_fold_nd``)."""
    from ffcl_spark.kernels.neighbors import pairwise_fold_nd

    return pairwise_fold_nd(mat, mat, metric)


def pam_build(d: np.ndarray, k: int, weights: np.ndarray | None = None) -> list[int]:
    """Greedy BUILD medoid initialization (published PAM semantics;
    see module docstring re the reference's comparator). Returns k
    row indices. ``weights``: per-sample multiplicities (the coreset /
    two-level path) — unit weights reproduce the unweighted result
    exactly."""
    n = d.shape[0]
    k = min(k, n)
    w = np.ones(n) if weights is None else np.asarray(weights, dtype=np.float64)
    # first medoid: minimum (weighted) total deviation
    # (PAMBuild.hpp:25-26, first_medoid_td_index_pair)
    m0 = int((d * w[None, :]).sum(axis=1).argmin())
    medoids = [m0]
    nearest = d[m0].copy()
    in_medoids = np.zeros(n, dtype=bool)
    in_medoids[m0] = True
    for _ in range(1, k):
        # reduction[c] = Σ_o w_o · max(0, nearest[o] − d[c, o]), o ∉ medoids ∪ {c}
        red = np.maximum(nearest[None, :] - d, 0.0) * w[None, :]
        red[:, in_medoids] = 0.0
        np.fill_diagonal(red, 0.0)
        gains = red.sum(axis=1)
        gains[in_medoids] = -np.inf
        c = int(gains.argmax())
        medoids.append(c)
        in_medoids[c] = True
        nearest = np.minimum(nearest, d[c])
    return medoids


def _buffers(d: np.ndarray, medoids: list[int]):
    """nearest / second-nearest medoid (list-index) and distances per
    sample — FasterPAM.hpp Buffers."""
    dm = d[medoids]  # (k, n)
    order = np.argsort(dm, axis=0, kind="stable")
    n = d.shape[0]
    cols = np.arange(n)
    i1 = order[0]
    d1 = dm[i1, cols]
    if len(medoids) > 1:
        i2 = order[1]
        d2 = dm[i2, cols]
    else:
        i2 = i1.copy()
        d2 = np.full(n, np.inf)
    return i1, d1, i2, d2


def fasterpam(
    d: np.ndarray,
    medoids: list[int],
    max_passes: int = 100,
    weights: np.ndarray | None = None,
) -> tuple[list[int], float, int]:
    """Eager-swap FasterPAM loop (``FasterPAM.hpp:137-201``).
    Returns (medoids, total_deviation, n_swaps). A pass scans every
    non-medoid candidate; accepted swaps apply immediately (buffers
    rebuilt); stops when a full pass makes no swap. ``weights``: per-
    sample multiplicities (weighted TD — unit weights are exactly the
    unweighted loop)."""
    medoids = list(medoids)
    k = len(medoids)
    n = d.shape[0]
    w = np.ones(n) if weights is None else np.asarray(weights, dtype=np.float64)
    i1, d1, i2, d2 = _buffers(d, medoids)
    n_swaps = 0
    for _ in range(max_passes):
        swapped = False
        for xc in range(n):
            if xc in medoids:
                continue
            doc = d[xc]
            lt1 = doc < d1
            lt2 = ~lt1 & (doc < d2)
            # ΔTD contribution per removed medoid i (FasterPAM paper /
            # find_best_swap): o with doc<d1 → 0 net for nearest(o);
            # d1≤doc<d2 → doc−d1; doc≥d2 → d2−d1 (pure removal loss)
            dl = np.zeros(k)
            np.add.at(dl, i1[lt2], (w * (doc - d1))[lt2])
            rest = ~lt1 & ~lt2
            np.add.at(dl, i1[rest], (w * (d2 - d1))[rest])
            delta_xc = float((w * (doc - d1))[lt1].sum())
            best_i = int(dl.argmin())
            delta = delta_xc + float(dl[best_i])
            if delta < 0:  # FasterPAM.hpp:147 strict
                medoids[best_i] = xc
                i1, d1, i2, d2 = _buffers(d, medoids)
                swapped = True
                n_swaps += 1
        if not swapped:
            break
    return medoids, float((w * d1).sum()), n_swaps


def _div0(num, den):
    """``common::division`` (Utils.hpp:431-440): 0 when the denominator
    is 0."""
    out = np.zeros_like(np.broadcast_arrays(num, den)[0], dtype=np.float64)
    np.divide(num, den, out=out, where=den != 0)
    return out


def msc_loss(d: np.ndarray, medoids: list[int]) -> float:
    """FasterMSC loss Σ_o d1(o)/d2(o) — n·(1 − medoid silhouette);
    minimizing it maximizes the average medoid silhouette
    [Lenssen & Schubert 2022; ``FasterMSC.hpp``]."""
    dm = np.sort(d[medoids], axis=0)
    return float(_div0(dm[0], dm[1]).sum())


def fastermsc(
    d: np.ndarray, medoids: list[int], max_passes: int = 100
) -> tuple[list[int], float, int]:
    """Eager-swap FasterMSC (``FasterMSC.hpp:step/find_best_swap``):
    swap deltas from 3-nearest-medoid buffers, accepted when the loss
    reduction is > 0 (k > 2) / the k=2 position-buffer special case
    (``find_best_swap_k2``). Buffers are fully recomputed after each
    accepted swap — identical results to the reference's incremental
    update, simpler invariants. Returns (medoids, msc_loss, n_swaps)."""
    medoids = list(medoids)
    k = len(medoids)
    if k < 2:
        raise ValueError("FasterMSC requires k >= 2 (FasterMSC.hpp)")
    n = d.shape[0]
    cols = np.arange(n)

    def buffers():
        dm = d[medoids]
        order = np.argsort(dm, axis=0, kind="stable")
        i1, d1 = order[0], dm[order[0], cols]
        i2, d2 = order[1], dm[order[1], cols]
        if k > 2:
            i3, d3 = order[2], dm[order[2], cols]
        else:
            i3, d3 = i2, np.full(n, np.inf)
        # base removal loss per medoid (PAMUtils.hpp:677-708,
        # compute_losses_with_silhouette_medoid_removal): reduction of
        # Σ d1/d2 when medoid i is removed with NO replacement effect
        base = np.zeros(k)
        if k > 2:
            np.add.at(base, i1, _div0(d1, d2) - _div0(d2, d3))
            np.add.at(base, i2, _div0(d1, d2) - _div0(d1, d3))
        return i1, d1, i2, d2, i3, d3, base

    i1, d1, i2, d2, i3, d3, base = buffers()
    n_swaps = 0
    for _ in range(max_passes):
        swapped = False
        for xc in range(n):
            if xc in medoids:
                continue
            doc = d[xc]
            if k == 2:
                # position-indexed buffers (find_best_swap_k2): loss of
                # {candidate, m1} resp. {m0, candidate}
                dm0 = d[medoids[0]]
                dm1 = d[medoids[1]]
                loss_keep1 = _div0(
                    np.minimum(doc, dm1), np.maximum(doc, dm1)
                ).sum()
                loss_keep0 = _div0(
                    np.minimum(doc, dm0), np.maximum(doc, dm0)
                ).sum()
                losses = np.array([loss_keep1, loss_keep0])
                best_i = int(losses.argmin())
                cur = _div0(np.minimum(dm0, dm1), np.maximum(dm0, dm1)).sum()
                if losses[best_i] < cur:
                    medoids[best_i] = xc
                    i1, d1, i2, d2, i3, d3, base = buffers()
                    swapped = True
                    n_swaps += 1
                continue
            # k > 2: loss REDUCTION per removed medoid = base removal
            # loss + candidate-conditional corrections (find_best_swap)
            dl = base.copy()
            lt1 = doc < d1
            lt2 = ~lt1 & (doc < d2)
            lt3 = ~lt1 & ~lt2 & (doc < d3)
            delta_xc = float(
                (_div0(d1, d2) - _div0(doc, d1))[lt1].sum()
                + (_div0(d1, d2) - _div0(d1, doc))[lt2].sum()
            )
            np.add.at(
                dl,
                i1[lt1],
                (_div0(doc, d1) + _div0(d2, d3) - _div0(d1 + doc, d2))[lt1],
            )
            np.add.at(dl, i2[lt1], (_div0(d1, d3) - _div0(d1, d2))[lt1])
            np.add.at(
                dl,
                i1[lt2],
                (_div0(d1, doc) + _div0(d2, d3) - _div0(d1 + doc, d2))[lt2],
            )
            np.add.at(dl, i2[lt2], (_div0(d1, d3) - _div0(d1, d2))[lt2])
            np.add.at(dl, i1[lt3], (_div0(d2, d3) - _div0(d2, doc))[lt3])
            np.add.at(dl, i2[lt3], (_div0(d1, d3) - _div0(d1, doc))[lt3])
            best_i = int(dl.argmax())
            delta = delta_xc + float(dl[best_i])
            if delta > 0:  # FasterMSC.hpp step(): improvement accepted
                medoids[best_i] = xc
                i1, d1, i2, d2, i3, d3, base = buffers()
                swapped = True
                n_swaps += 1
        if not swapped:
            break
    return medoids, msc_loss(d, medoids), n_swaps


def pam(
    mat: np.ndarray,
    k: int,
    metric: str = "euclidean",
    init: str = "build",
    seed: int = 7,
    max_passes: int = 100,
    algorithm: str = "fasterpam",
    weights: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """BUILD (or seeded-random, ``KMedoids.hpp:166-171``) init +
    FasterPAM (default) or FasterMSC swaps. Returns (medoid row
    indices sorted ascending, loss — total deviation for fasterpam,
    Σ d1/d2 for fastermsc). ``weights``: per-sample multiplicities
    (fasterpam only — the coreset / two-level path)."""
    d = distance_matrix(mat, metric)
    n = len(mat)
    k = min(k, n)
    if init == "build":
        med0 = pam_build(d, k, weights=weights)
    elif init == "random":
        rng = np.random.default_rng(seed)
        med0 = list(rng.choice(n, size=k, replace=False))
    else:
        raise ValueError(f"unknown init {init!r}")
    if algorithm == "fasterpam" or k < 2:
        # k=1 degenerates identically for both objectives (single best
        # medoid); FasterMSC itself requires k ≥ 2 (FasterMSC.hpp)
        medoids, loss, _ = fasterpam(d, med0, max_passes, weights=weights)
    elif algorithm == "fastermsc":
        if weights is not None:
            raise ValueError("weights are supported for fasterpam only")
        medoids, loss, _ = fastermsc(d, med0, max_passes)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return np.array(sorted(medoids), dtype=np.int64), loss


def total_deviation(mat: np.ndarray, medoid_rows: np.ndarray, metric: str = "euclidean") -> float:
    from ffcl_spark.kernels.neighbors import pairwise_fold_nd

    d = pairwise_fold_nd(mat, mat[medoid_rows], metric)
    return float(d.min(axis=1).sum())
