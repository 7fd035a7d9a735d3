"""Local exact MST (Prim) — the small-input fast path of
``operators.boruvka.minimum_spanning_tree``.

Semantics identical to the distributed Borůvka: Euclidean or
mutual-reachability (``max(core_a, core_b, d)``, self-counted k-th-NN
core distances) edge weights; deterministic under ties via (w, src,
dst) edge ordering at extraction. O(n²) — used only below the
operator's ``local_cutoff``.
"""

from __future__ import annotations

import numpy as np


def _dist_matrix(xy: np.ndarray) -> np.ndarray:
    # fold-order accumulation over dimensions — bit-identical to the
    # distributed distance (2-D SQL expression AND the n-D JVM fold,
    # see kernels.neighbors.pairwise_fold_nd); works for any n_features
    acc = np.zeros((len(xy), len(xy)), dtype=np.float64)
    for j in range(xy.shape[1]):
        d = xy[:, j][:, None] - xy[:, j][None, :]
        acc = acc + d * d
    return np.sqrt(acc)


def prim_mst(
    xy: np.ndarray, ids: np.ndarray, core_k: int | None = None
) -> list[tuple]:
    """[(src_id, dst_id, weight)] — n−1 edges."""
    n = len(xy)
    if n <= 1:
        return []
    d = _dist_matrix(xy)
    if core_k is not None:
        kk = min(core_k, n)
        core = np.sort(d, axis=1)[:, kk - 1]  # self included (column 0 is 0)
        d = np.maximum(d, np.maximum(core[:, None], core[None, :]))
        np.fill_diagonal(d, 0.0)
    # deterministic start: smallest id
    order = np.argsort(ids, kind="stable")
    start = order[0]
    in_tree = np.zeros(n, dtype=bool)
    in_tree[start] = True
    best = d[start].copy()
    best_src = np.full(n, start, dtype=np.int64)
    edges = []
    def _py(v):
        # plain-Python scalars: numpy ints/strs break createDataFrame
        # schema checks downstream
        return v.item() if isinstance(v, np.generic) else v

    for _ in range(n - 1):
        cand = np.where(in_tree, np.inf, best)
        j = int(cand.argmin())
        edges.append((_py(ids[best_src[j]]), _py(ids[j]), float(best[j])))
        in_tree[j] = True
        upd = d[j] < best
        best[upd] = d[j][upd]
        best_src[upd] = j
    return edges
