"""Deterministic fixture point sets + docs-from-points synthesis.

Reproduces the *shape families* of the reference's clustering fixtures
(``bin/MakeClusteringDatasets.py:40-65``: circles, moons, blobs,
uniform, unbalanced blobs — sklearn-generated there; pure NumPy here
since sklearn is not available, seeded → deterministic), standardized
and ×10-scaled like the reference (``MakeClusteringDatasets.py:135-139``),
float32-cast, so coordinates land in roughly [-30, 30]².

``grid_exact`` is the tie-heavy determinism fixture (FIXTURES.md §2):
an integer lattice where exact distance ties are guaranteed, to prove
the engine's (distance, neighbor_id) tie-break is deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _standardize_x10(xy: np.ndarray) -> np.ndarray:
    xy = (xy - xy.mean(axis=0)) / xy.std(axis=0)
    return (xy * 10.0).astype(np.float32).astype(np.float64)


def make_points(kind: str, n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "noisy_circles":
        half = n // 2
        t1 = rng.uniform(0, 2 * np.pi, half)
        t2 = rng.uniform(0, 2 * np.pi, n - half)
        xy = np.concatenate(
            [
                np.stack([np.cos(t1), np.sin(t1)], axis=1),
                0.5 * np.stack([np.cos(t2), np.sin(t2)], axis=1),
            ]
        )
        xy += rng.normal(0, 0.05, xy.shape)
    elif kind == "noisy_moons":
        half = n // 2
        t1 = rng.uniform(0, np.pi, half)
        t2 = rng.uniform(0, np.pi, n - half)
        m1 = np.stack([np.cos(t1), np.sin(t1)], axis=1)
        m2 = np.stack([1 - np.cos(t2), 0.5 - np.sin(t2)], axis=1)
        xy = np.concatenate([m1, m2]) + rng.normal(0, 0.1, (n, 2))
    elif kind == "blobs":
        centers = rng.uniform(-10, 10, (3, 2))
        labels = rng.integers(0, 3, n)
        xy = centers[labels] + rng.normal(0, 1.0, (n, 2))
    elif kind == "unbalanced_blobs":
        sizes = [int(0.3 * n), int(0.6 * n)]
        sizes.append(n - sum(sizes))
        centers = rng.uniform(-10, 10, (3, 2))
        xy = np.concatenate(
            [c + rng.normal(0, 1.0, (s, 2)) for c, s in zip(centers, sizes)]
        )
    elif kind == "no_structure":
        xy = rng.uniform(0, 1, (n, 2))
    elif kind == "grid_exact":
        side = int(np.ceil(np.sqrt(n)))
        gx, gy = np.meshgrid(np.arange(side), np.arange(side))
        xy = np.stack([gx.ravel(), gy.ravel()], axis=1)[:n].astype(np.float64)
        # lattice in [-side/2, side/2] scaled to ~[-20, 20]; NO jitter →
        # exact ties by symmetry
        xy = (xy - xy.mean(axis=0)) * (40.0 / side)
        return xy
    else:
        raise ValueError(f"unknown fixture kind {kind!r}")
    return _standardize_x10(xy)


FIXTURE_KINDS = (
    "noisy_circles",
    "noisy_moons",
    "blobs",
    "unbalanced_blobs",
    "no_structure",
    "grid_exact",
)


def points_df(spark: SparkSession, kind: str, n: int, seed: int = 7) -> DataFrame:
    xy = make_points(kind, n, seed)
    pdf = pd.DataFrame(
        {"id": np.arange(len(xy), dtype=np.int64), "x": xy[:, 0], "y": xy[:, 1]}
    )
    return spark.createDataFrame(pdf)


def docs_from_points(spark: SparkSession, kind: str, n: int, seed: int = 7) -> DataFrame:
    """Interleaved docs whose media spans carry the fixture points:
    doc i = [media(point 2i), text, media(point 2i+1)] — the union of
    media coordinates reproduces the fixture set exactly."""
    xy = make_points(kind, n, seed)
    if len(xy) % 2:
        xy = xy[:-1]
    rows = []
    for d in range(len(xy) // 2):
        spans = []
        for m, off in ((0, 0), (1, 2)):
            p = xy[2 * d + m]
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"media://doc-{d}/{off}?x={p[0]:.6f}&y={p[1]:.6f}",
                    "offset": off,
                }
            )
        spans.insert(
            1,
            {"kind": "text", "text": f"fixture {kind} doc {d}", "media_ref": "", "offset": 1},
        )
        rows.append({"doc_id": f"doc-{d}", "spans": spans})
    from ffcl_spark.sources.docs import DOCS_SCHEMA

    return spark.createDataFrame(rows, DOCS_SCHEMA)
