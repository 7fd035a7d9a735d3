"""Parity of the r6 kNN-graph Kruskal bootstrap path of
``minimum_spanning_tree`` (active when n > 256, driver_cutoff > 0 and
n·k0 fits the driver budget) against the local Prim oracle — sorted
weight multisets must be identical (the projection every MST of a
graph shares), for both the distance and the mutual-reachability
metric, on a clustered fixture whose inter-cluster gaps exceed the
k0-NN horizon (so the freeze rule and the escalated driver sweeps are
actually exercised, not just the happy path)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ffcl_spark.config import EngineConfig
from ffcl_spark.operators.boruvka import minimum_spanning_tree

CFG = EngineConfig(resolution=4)


@pytest.fixture(scope="module")
def clustered_pts(spark):
    rng = np.random.default_rng(23)
    blobs = []
    centers = [(-20, -20), (-20, 18), (15, -15), (22, 20), (0, 0)]
    for i, (cx, cy) in enumerate(centers):
        m = 120 + 40 * i
        blobs.append(
            np.stack(
                [cx + rng.normal(0, 1.2, m), cy + rng.normal(0, 1.2, m)], axis=1
            )
        )
    # a sparse scatter bridging nothing (forces frozen comps at k0)
    blobs.append(
        np.stack([rng.uniform(-28, 28, 60), rng.uniform(-28, 28, 60)], axis=1)
    )
    pts = np.concatenate(blobs)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double").persist()
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("core_k", [None, 5])
def test_bootstrap_matches_prim_weight_multiset(spark, clustered_pts, core_k):
    n = clustered_pts.count()
    assert n > 256  # the bootstrap path is what runs
    dist = minimum_spanning_tree(clustered_pts, CFG, core_k=core_k)
    wd = np.sort(np.array([r["w"] for r in dist.collect()]))
    prim = minimum_spanning_tree(
        clustered_pts, CFG, core_k=core_k, local_cutoff=n
    )
    wp = np.sort(np.array([r["w"] for r in prim.collect()]))
    assert len(wd) == n - 1 == len(wp)
    assert np.array_equal(wd, wp)
