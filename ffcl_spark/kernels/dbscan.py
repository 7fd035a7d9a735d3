"""Local DBSCAN oracle with the reference's exact semantics.

Reference ``DBSCAN.hpp:103-191``:
- core iff |N_radius(p)| > min_samples, **strict**, neighborhood
  includes p itself (``DBSCAN.hpp:134``) and uses **strict**
  dist < radius (``Ball.hpp:96``);
- noise label 0, clusters numbered from 1 in discovery order;
- border points take the label of the first core that reaches them
  (``DBSCAN.hpp:186-189``) — scan-order dependent.

Because discovery order is irreproducible distributedly, comparisons
canonicalize labels (SURVEY.md §7): cluster id := min point id in the
cluster's **core set**, border points attach to the minimum cluster id
among their in-radius cores, noise = 0 stays 0. This oracle can emit
either raw (scan-order) or canonical labels.
"""

from __future__ import annotations

import numpy as np

from ffcl_spark.kernels.neighbors import pairwise_sq_2d

BLOCK = 2048


def neighbor_counts_and_adj(xy: np.ndarray, radius: float):
    """Per-point neighbor count (self included) and adjacency lists."""
    n = len(xy)
    adj: list[np.ndarray] = []
    for s in range(0, n, BLOCK):
        e = min(s + BLOCK, n)
        d = np.sqrt(pairwise_sq_2d(xy[s:e], xy))  # sqrt'd: match SQL strictness
        for row in d < radius:
            adj.append(np.nonzero(row)[0])
    counts = np.array([len(a) for a in adj], dtype=np.int64)
    return counts, adj


def dbscan_labels(
    xy: np.ndarray, radius: float, min_samples: int, canonical_ids: np.ndarray | None = None
) -> np.ndarray:
    """FFCL-exact DBSCAN. Returns labels aligned to rows.

    With ``canonical_ids`` given, labels are canonicalized: a cluster
    is labeled by the minimum canonical id among its core points;
    border points get the min label among their in-radius cores.
    Without it, raw scan-order labels (noise 0, clusters 1..) are
    returned — byte-compatible with the reference's sequential scan.
    """
    n = len(xy)
    counts, adj = neighbor_counts_and_adj(xy, radius)
    is_core = counts > min_samples  # strict, self included
    labels = np.zeros(n, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    cluster = 0
    for i in range(n):
        if visited[i] or not is_core[i]:
            continue
        cluster += 1
        # BFS expansion over cores (DBSCAN.hpp:151-191)
        stack = [i]
        visited[i] = True
        labels[i] = cluster
        while stack:
            p = stack.pop()
            for q in adj[p]:
                if labels[q] == 0:
                    labels[q] = cluster  # border or core claimed
                if not visited[q] and is_core[q]:
                    visited[q] = True
                    stack.append(q)

    if canonical_ids is None:
        return labels

    # canonical relabel: cluster label := min canonical id over CORE
    # members; border points := min cluster label among in-radius cores
    ids = np.asarray(canonical_ids)
    canon = np.zeros(n, dtype=ids.dtype)
    for c in range(1, cluster + 1):
        members = (labels == c) & is_core
        canon_label = ids[members].min()
        canon[(labels == c) & is_core] = canon_label
    for i in range(n):
        if labels[i] != 0 and not is_core[i]:
            core_nbrs = [q for q in adj[i] if is_core[q]]
            canon[i] = min(canon[q] for q in core_nbrs)
    return canon
