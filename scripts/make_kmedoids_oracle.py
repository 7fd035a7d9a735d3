"""Generate pinned k-medoids oracles for the driver correctness gates.

The four k-medoids gates (`kmedoids`, `kmedoids_msc`, `kmedoids_cells`,
`kmedoids_two_level`) emit deterministic integer/string decisions —
medoid ids and nearest-medoid labels over exact float64 distances — but
PAM's eager-swap trajectory is not expressible as reasonable DuckDB
SQL. As with the HDBSCAN pins (scripts/make_hdbscan_oracle.py), this
script recomputes the expected outputs OUTSIDE Spark — pure
NumPy/pandas over the deterministic doc-points fixture, calling the
pytest-trusted local kernels (`kernels.pam`, whose swap-optimality is
property-checked in tests/test_kmedoids.py) — and stores them in
``oracles/kmedoids_pinned_sf001.json``. ``__spark_entry__.oracle_sql``
embeds them as VALUES relations, turning the gates from rows-only into
exact-match driver checks of the distributed pipeline (synthesis →
span extraction → [cell kernel →] PAM → distributed assignment join).

What this checks end-to-end that pytest alone does not: the Spark-side
coordinate extraction, cell partitioning, Arrow kernel batching, and
the broadcast-literal assignment expression (`_assign_expr` tie-break
toward the smaller medoid id) all reproduce the pinned decisions at
the driver's correctness scale.

Pins are valid for the sf0.01 fixture only; at any other sf the
row-count comparison fails loudly. Rerun after changing gate params:

    python scripts/make_kmedoids_oracle.py

Reference: KMedoids.hpp:153-230 (pipeline), FasterPAM.hpp:137-201,
PAMBuild.hpp (greedy init), FasterMSC.hpp:148+ (silhouette objective).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffcl_spark.kernels.neighbors import pairwise_fold_nd  # noqa: E402
from ffcl_spark.kernels.pam import pam  # noqa: E402
from ffcl_spark.sources.docs import AX_ADD, AX_MUL, AY_ADD, AY_MUL  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "oracles", "kmedoids_pinned_sf001.json",
)
K = 4            # q_kmedoids / q_kmedoids_msc / q_kmedoids_two_level
K_CELL = 2       # q_kmedoids_cells
K_LOCAL = 4      # q_kmedoids_two_level coreset size per cell
RES = 4          # CFG resolution in __spark_entry__
SEED = 7


def doc_points() -> pd.DataFrame:
    """media_points over synth_docs in pure Python ints (the same
    AX/AY mixing as sources/docs.py): 2 spans per doc, offsets 0/2."""
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = sorted(int(v) for v in t.column("doc_id").to_pylist())
    pids, xs, ys = [], [], []
    for d in ids:
        for m, off in ((0, 0), (1, 2)):
            pid = 2 * d + m
            ax = (pid * AX_MUL + AX_ADD) % 4294967296
            ay = (pid * AY_MUL + AY_ADD) % 4294967296
            pids.append(f"doc-{d}#{off}")
            xs.append((ax % 60000 - 30000) / 1000.0)
            ys.append((ay % 60000 - 30000) / 1000.0)
    return pd.DataFrame({"id": pids, "x": xs, "y": ys})


def cell_of(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """functions/cells.cell_id for the default (-30, 60) domain at RES."""
    grid = 1 << RES
    cs = 60.0 / grid
    ix = np.clip(np.floor((x - (-30.0)) / cs).astype(np.int64), 0, grid - 1)
    iy = np.clip(np.floor((y - (-30.0)) / cs).astype(np.int64), 0, grid - 1)
    return RES * (1 << 52) + ix * (1 << 26) + iy


def assign_labels(pdf: pd.DataFrame, med_ids: list, med_xy: np.ndarray) -> list:
    """operators/kmedoids._assign_expr in NumPy: squared-euclidean to
    each medoid (same float64 op order), ties toward the smaller
    medoid id (medoids pre-sorted by id; argmin keeps the first)."""
    order = np.argsort(np.array(med_ids, dtype=object))
    mids = [med_ids[i] for i in order]
    mxy = med_xy[order]
    dx = pdf["x"].to_numpy()[:, None] - mxy[:, 0][None, :]
    dy = pdf["y"].to_numpy()[:, None] - mxy[:, 1][None, :]
    d2 = dx * dx + dy * dy
    return [mids[j] for j in d2.argmin(axis=1)]


def flat_gate(pdf: pd.DataFrame, algorithm: str) -> list[list]:
    """q_kmedoids / q_kmedoids_msc: whole-input PAM (sample covers the
    fixture), labels via the assignment expression."""
    s = pdf.sort_values("id").reset_index(drop=True)
    mat = s[["x", "y"]].to_numpy(dtype=np.float64)
    med_rows, _ = pam(mat, K, metric="euclidean", init="build", seed=SEED,
                      max_passes=100, algorithm=algorithm)
    med_ids = [s["id"].iloc[int(r)] for r in med_rows]
    labels = assign_labels(s, med_ids, mat[np.asarray(med_rows, dtype=int)])
    return [[i, lab] for i, lab in zip(s["id"], labels)]


def per_cell(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """operators/kmedoids.kmedoids_per_cell kernel, locally: per-cell
    PAM medoids + member counts (weight)."""
    pdf = pdf.assign(cell=cell_of(pdf["x"].to_numpy(), pdf["y"].to_numpy()))
    rows = []
    for cell, g in pdf.groupby("cell"):
        g = g.sort_values("id").reset_index(drop=True)
        mat = g[["x", "y"]].to_numpy(dtype=np.float64)
        med_rows, _ = pam(mat, k, metric="euclidean", init="build",
                          algorithm="fasterpam")
        dm = pairwise_fold_nd(mat, mat[np.asarray(med_rows, dtype=int)], "euclidean")
        counts = np.bincount(dm.argmin(axis=1), minlength=len(med_rows))
        for j, r in enumerate(med_rows):
            rows.append((int(cell), g["id"].iloc[int(r)], int(counts[j])))
    return pd.DataFrame(rows, columns=["cell", "medoid_id", "weight"])


def two_level_gate(pdf: pd.DataFrame) -> list[list]:
    """q_kmedoids_two_level: per-cell coreset → weighted global PAM →
    assignment labels (operators/kmedoids.kmedoids_two_level)."""
    coreset = per_cell(pdf, K_LOCAL)
    c = coreset.merge(pdf.rename(columns={"id": "medoid_id"}), on="medoid_id")
    c = c.sort_values("medoid_id").reset_index(drop=True)
    mat = c[["x", "y"]].to_numpy(dtype=np.float64)
    med_rows, _ = pam(mat, K, metric="euclidean", init="build", max_passes=100,
                      weights=c["weight"].to_numpy())
    idx = np.asarray(med_rows, dtype=int)
    med_ids = [c["medoid_id"].iloc[int(r)] for r in idx]
    labels = assign_labels(pdf, med_ids, mat[idx])
    return [[i, lab] for i, lab in zip(pdf["id"], labels)]


def main() -> None:
    pdf = doc_points()
    pins = {
        "sf_dir": SF_DIR,
        "kmedoids": flat_gate(pdf, "fasterpam"),
        "kmedoids_msc": flat_gate(pdf, "fastermsc"),
        "kmedoids_cells": [
            [r.cell, r.medoid_id] for r in per_cell(pdf, K_CELL).itertuples()
        ],
        "kmedoids_two_level": two_level_gate(pdf),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(pins, f)
    for name in ("kmedoids", "kmedoids_msc", "kmedoids_cells", "kmedoids_two_level"):
        labs = {r[1] for r in pins[name]}
        print(f"{name}: {len(pins[name])} rows, {len(labs)} distinct labels/medoids")


if __name__ == "__main__":
    main()
