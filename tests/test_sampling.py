"""Vose alias-method kernel — reference VosesAliasMethod.hpp:16-50."""

import numpy as np
import pytest

from ffcl_spark.kernels.sampling import VoseAlias, weighted_sample_indices


def test_alias_table_invariants():
    rng = np.random.default_rng(2)
    for n in (1, 2, 7, 100):
        w = rng.uniform(0.0, 5.0, size=n)
        w[rng.integers(0, n)] = 0.0 if n > 1 else 1.0
        va = VoseAlias(w, seed=5)
        # per-column expected mass reconstructs the normalized weights
        n_ = len(w)
        mass = va.prob / n_
        np.add.at(mass, va.alias, (1.0 - va.prob) / n_)
        np.testing.assert_allclose(mass, w / w.sum(), atol=1e-12)


def test_draws_deterministic_and_distributed_correctly():
    w = np.array([1.0, 0.0, 3.0, 6.0])
    a = weighted_sample_indices(w, 200_000, seed=11)
    b = weighted_sample_indices(w, 200_000, seed=11)
    assert np.array_equal(a, b)
    freq = np.bincount(a, minlength=4) / len(a)
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)
    assert freq[1] == 0.0  # zero weight never drawn


def test_rejects_bad_weights():
    for bad in ([], [0.0, 0.0], [-1.0, 2.0]):
        with pytest.raises(ValueError):
            VoseAlias(np.array(bad))
