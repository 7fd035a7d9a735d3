"""Seeded sampling kernels.

Vose's alias method — reference ``VosesAliasMethod.hpp:16-50`` — for
O(1)-per-draw weighted sampling with a seeded generator. Used
driver-side (weighted init draws over bounded samples, e.g. coreset /
kmeans++-style seeding); per-row engine sampling stays a seeded hash
filter (``pmod(xxhash64(id, seed), m)``) because a scan predicate is
the scale-correct form.
"""

from __future__ import annotations

import numpy as np


class VoseAlias:
    """Alias table over nonnegative weights; deterministic under the
    seed. Construction is the classic small/large worklist split
    (Vose 1991); draws are one uniform + one coin each."""

    def __init__(self, weights: np.ndarray, seed: int = 7):
        w = np.asarray(weights, dtype=np.float64)
        if len(w) == 0 or (w < 0).any() or w.sum() <= 0:
            raise ValueError("weights must be nonempty, nonnegative, with positive sum")
        n = len(w)
        p = w * (n / w.sum())
        self.prob = np.zeros(n)
        self.alias = np.zeros(n, dtype=np.int64)
        small = [i for i in range(n) if p[i] < 1.0]
        large = [i for i in range(n) if p[i] >= 1.0]
        while small and large:
            s = small.pop()
            g = large.pop()
            self.prob[s] = p[s]
            self.alias[s] = g
            p[g] = (p[g] + p[s]) - 1.0
            (small if p[g] < 1.0 else large).append(g)
        for i in large + small:  # numerical leftovers sit at 1
            self.prob[i] = 1.0
            self.alias[i] = i
        self._rng = np.random.default_rng(seed)

    def draw(self, n: int) -> np.ndarray:
        """n column indices, O(n) total."""
        cols = self._rng.integers(0, len(self.prob), size=n)
        coin = self._rng.random(n)
        take = coin < self.prob[cols]
        return np.where(take, cols, self.alias[cols])


def weighted_sample_indices(weights: np.ndarray, n: int, seed: int = 7) -> np.ndarray:
    """n independent draws ∝ weights (with replacement), deterministic
    under the seed — the reference's weighted-pick primitive."""
    return VoseAlias(weights, seed).draw(n)
